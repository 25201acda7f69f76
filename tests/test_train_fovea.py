"""FoveaBox: target oracle vs the reference loop, trainer step, inference."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.train_fcos import FoveaTrainer, fovea_level_targets


def fovea_target_np(gts, labels, feat_hw, stride, base_len, lo, hi, sigma):
    """Reference fovea_target_single (fovea_head.py:254-312), one level."""
    h, w = feat_hw
    lab = np.zeros((h, w), np.int64)
    tgt = np.ones((h, w, 4), np.float32)
    areas = np.sqrt((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))
    hit = np.nonzero((areas >= lo) & (areas <= hi))[0]
    hit = hit[np.argsort(-areas[hit])]          # big → small, small wins
    y, x = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    for g in hit:
        gs = gts[g] / stride
        hw_, hh = 0.5 * (gs[2] - gs[0]), 0.5 * (gs[3] - gs[1])
        px1 = int(np.clip(np.ceil(gs[0] + (1 - sigma) * hw_ - 0.5), 0, w - 1))
        px2 = int(np.clip(np.floor(gs[0] + (1 + sigma) * hw_ - 0.5), 0, w - 1))
        py1 = int(np.clip(np.ceil(gs[1] + (1 - sigma) * hh - 0.5), 0, h - 1))
        py2 = int(np.clip(np.floor(gs[1] + (1 + sigma) * hh - 0.5), 0, h - 1))
        sl = np.s_[py1:py2 + 1, px1:px2 + 1]
        lab[sl] = labels[g]
        tgt[sl][..., 0] = (stride * x[sl] - gts[g, 0]) / base_len
        tgt[py1:py2 + 1, px1:px2 + 1, 0] = \
            (stride * x[sl] - gts[g, 0]) / base_len
        tgt[py1:py2 + 1, px1:px2 + 1, 1] = \
            (stride * y[sl] - gts[g, 1]) / base_len
        tgt[py1:py2 + 1, px1:px2 + 1, 2] = \
            (gts[g, 2] - stride * x[sl]) / base_len
        tgt[py1:py2 + 1, px1:px2 + 1, 3] = \
            (gts[g, 3] - stride * y[sl]) / base_len
    return lab.reshape(-1), np.log(np.clip(tgt, 1 / 16, 16)).reshape(-1, 4)


def test_fovea_targets_match_reference_loop():
    gts = np.array([[10, 12, 80, 90], [30, 30, 140, 150],
                    [8, 8, 100, 40]], np.float32)
    labels = np.array([2, 7, 4], np.int64)
    mask = np.ones(3, bool)
    feat_hw, stride, base_len, lo, hi = (16, 20), 8, 32, 16, 256
    lj, tj, pj = fovea_level_targets(
        jnp.asarray(gts), jnp.asarray(mask), jnp.asarray(labels),
        feat_hw, stride, base_len, lo, hi, sigma=0.4)
    ln, tn = fovea_target_np(gts, labels, feat_hw, stride, base_len,
                             lo, hi, 0.4)
    np.testing.assert_array_equal(np.asarray(lj), ln)
    pos = ln > 0
    np.testing.assert_allclose(np.asarray(tj)[pos], tn[pos],
                               rtol=1e-5, atol=1e-5)
    assert pos.sum() == int(np.asarray(pj).sum())


def test_fovea_trainer_step_and_inference():
    from hvrnet_tpu.engine.single_stage import FOVEA
    model_cfg = dict(
        type='FOVEA',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type='FoveaHead', num_classes=11, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128],
                       base_edge_list=[16, 32, 64, 128, 256],
                       scale_ranges=((1, 64), (32, 128), (64, 256),
                                     (128, 512), (256, 2048)),
                       sigma=0.4,
                       loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                                      loss_weight=0.1)))
    eng = FOVEA(model_cfg, dict(),
                dict(score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
                     max_per_img=10, nms_pre=100))
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    trainer = FoveaTrainer(eng, dict(optimizer=dict(lr=1e-2)),
                           steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 64)
    rng = np.random.default_rng(0)
    G = 4
    gt = np.zeros((1, G, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 40]
    gt[0, 1] = [20, 25, 60, 60]
    gm = np.zeros((1, G), bool)
    gm[0, :2] = True
    gl = np.zeros((1, G), np.int64)
    gl[0, :2] = [1, 5]
    batch = dict(imgs=rng.normal(size=(1, 1, 64, 64, 3)).astype(np.float32),
                 gt_bboxes=gt[None], gt_labels=gl[None], gt_mask=gm[None],
                 img_shape=np.array([[[64.0, 64.0]]], np.float32))
    p0 = np.asarray(params["params"]["bbox_head"]["fovea_reg"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["num_pos"]) > 0
    p1 = np.asarray(state2.params["params"]["bbox_head"]["fovea_reg"]["bias"])
    assert not np.array_equal(p0, p1)

    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    dets, labels, mask = eng.simple_test(
        state2.params, img, np.array([64.0, 64.0], np.float32),
        np.array([1.0] * 4, np.float32))
    assert dets.shape == (10, 5)
    assert np.isfinite(np.asarray(dets)).all()
