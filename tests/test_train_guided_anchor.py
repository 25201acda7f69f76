"""Guided-anchoring: loc-target oracle, shape-target sanity, trainer step,
and GA inference smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.train_guided_anchor import (GATrainer, ga_loc_targets,
                                                   ga_shape_target_single)


def _calc_region_np(bbox, ratio, fm):
    x1 = np.clip(np.round((1 - ratio) * bbox[0] + ratio * bbox[2]), 0, fm[1] - 1)
    y1 = np.clip(np.round((1 - ratio) * bbox[1] + ratio * bbox[3]), 0, fm[0] - 1)
    x2 = np.clip(np.round(ratio * bbox[0] + (1 - ratio) * bbox[2]), 0, fm[1] - 1)
    y2 = np.clip(np.round(ratio * bbox[1] + (1 - ratio) * bbox[3]), 0, fm[0] - 1)
    return int(x1), int(y1), int(x2), int(y2)


def ga_loc_target_np(gts, featmap_sizes, scale, strides, cr=0.2, ir=0.5):
    """Sequential reference loop (guided_anchor_target.py:32-131)."""
    L = len(featmap_sizes)
    r1, r2 = (1 - cr) / 2, (1 - ir) / 2
    t = [np.zeros(s, np.float32) for s in featmap_sizes]
    w = [np.full(s, -1.0, np.float32) for s in featmap_sizes]
    ign = [np.zeros(s, np.float32) for s in featmap_sizes]
    sc = np.sqrt((gts[:, 2] - gts[:, 0] + 1) * (gts[:, 3] - gts[:, 1] + 1))
    lvls = np.clip(np.floor(np.log2(sc) - np.log2(scale * strides[0]) + 0.5),
                   0, L - 1).astype(int)
    for g in range(gts.shape[0]):
        lvl = lvls[g]
        gt = gts[g] / strides[lvl]
        ix1, iy1, ix2, iy2 = _calc_region_np(gt, r2, featmap_sizes[lvl])
        cx1, cy1, cx2, cy2 = _calc_region_np(gt, r1, featmap_sizes[lvl])
        t[lvl][cy1:cy2 + 1, cx1:cx2 + 1] = 1
        w[lvl][iy1:iy2 + 1, ix1:ix2 + 1] = 0
        w[lvl][cy1:cy2 + 1, cx1:cx2 + 1] = 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < L:
                gt = gts[g] / strides[d]
                x1, y1, x2, y2 = _calc_region_np(gt, r2, featmap_sizes[d])
                ign[d][y1:y2 + 1, x1:x2 + 1] = 1
    for lvl in range(L):
        w[lvl][(w[lvl] < 0) & (ign[lvl] > 0)] = 0
        w[lvl][w[lvl] < 0] = 0.1
    return t, w


def test_ga_loc_targets_match_reference_loop():
    sizes = [(16, 24), (8, 12), (4, 6)]
    strides = [8, 16, 32]
    # non-overlapping, scale-separated gts (priority scheme == sequential)
    gts = np.array([[10, 10, 70, 70],        # small → lvl 0
                    [80, 20, 180, 110],      # medium → lvl 1
                    [4, 80, 120, 127]], np.float32)
    mask = np.array([1, 1, 1], bool)
    tj, wj, avg = ga_loc_targets(jnp.asarray(gts), jnp.asarray(mask),
                                 sizes, strides, octave_base_scale=8)
    tn, wn = ga_loc_target_np(gts, sizes, 8, strides)
    for lvl in range(3):
        np.testing.assert_array_equal(np.asarray(tj[lvl]),
                                      tn[lvl].reshape(-1))
        np.testing.assert_allclose(np.asarray(wj[lvl]),
                                   wn[lvl].reshape(-1))
    assert avg == sum(h * w for h, w in sizes) / 200.0


def test_ga_shape_target_assigns_by_group_max():
    # one square whose best approx overlaps the gt strongly
    squares = jnp.asarray([[0., 0., 31., 31.], [100., 100., 131., 131.]])
    # groups of 2 approxs each; group 0 contains a perfect match
    approxs = jnp.asarray([[0., 0., 31., 31.], [0., 0., 63., 63.],
                           [100., 100., 131., 131.], [90., 90., 141., 141.]])
    gts = jnp.asarray([[0., 0., 63., 63.]])
    bbox_gts, pos_w, fg = ga_shape_target_single(
        approxs, squares, jnp.ones(2, bool), gts, jnp.ones(1, bool), 2,
        pos_iou_thr=0.7, neg_iou_thr=0.3)
    assert int(fg) == 1
    np.testing.assert_array_equal(np.asarray(pos_w), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(bbox_gts[0]), [0, 0, 63, 63])


def _ga_model_cfg():
    return dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type='GARetinaHead', num_classes=11, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       octave_base_scale=8, scales_per_octave=3,
                       octave_ratios=[0.5, 1.0, 2.0],
                       anchor_strides=[8, 16, 32, 64, 128],
                       anchoring_means=[0., 0., 0., 0.],
                       anchoring_stds=[0.07, 0.07, 0.14, 0.14],
                       target_means=[0., 0., 0., 0.],
                       target_stds=[1., 1., 1., 1.],
                       loc_filter_thr=0.01,
                       loss_bbox=dict(type='SmoothL1Loss', beta=0.04,
                                      loss_weight=1.0)))


def test_ga_trainer_step_and_inference():
    from hvrnet_tpu.engine.single_stage import RetinaNet
    train_cfg = dict(
        ga_assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.4),
        assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0),
        allowed_border=-1, center_ratio=0.2, ignore_ratio=0.5)
    eng = RetinaNet(_ga_model_cfg(), train_cfg,
                    dict(score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
                         max_per_img=10, nms_pre=100))
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    trainer = GATrainer(eng, dict(optimizer=dict(lr=1e-2)),
                        steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 64)
    rng = np.random.default_rng(0)
    G = 4
    gt = np.zeros((1, G, 4), np.float32)
    # big enough that an octave-8 square (64 px at stride 8) is a positive
    gt[0, 0] = [2, 2, 57, 57]
    gt[0, 1] = [8, 4, 59, 63]
    gm = np.zeros((1, G), bool)
    gm[0, :2] = True
    gl = np.zeros((1, G), np.int64)
    gl[0, :2] = [1, 5]
    batch = dict(imgs=rng.normal(size=(1, 1, 64, 64, 3)).astype(np.float32),
                 gt_bboxes=gt[None], gt_labels=gl[None], gt_mask=gm[None],
                 img_shape=np.array([[[64.0, 64.0]]], np.float32))
    p0 = np.asarray(params["params"]["bbox_head"]["conv_shape"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_loc", "loss_shape", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["loss_loc"]) > 0
    p1 = np.asarray(
        state2.params["params"]["bbox_head"]["conv_shape"]["bias"])
    assert not np.array_equal(p0, p1)

    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    dets, labels, mask = eng.simple_test(
        state2.params, img, np.array([64.0, 64.0], np.float32),
        np.array([1.0] * 4, np.float32))
    assert dets.shape == (10, 5)
    assert np.isfinite(np.asarray(dets)).all()
