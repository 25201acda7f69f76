"""Mask R-CNN / Cascade R-CNN training steps: finite losses, params update."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.multi_stage import CascadeRCNN, MaskRCNN
from hvrnet_tpu.engine.train_two_stage import TwoStageTrainer
from tests.test_multi_stage import base_cfg


def _train_cfg(num_stages=1, with_mask=False):
    stage = lambda pos_thr: dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=pos_thr,
                      neg_iou_thr=pos_thr, min_pos_iou=pos_thr),
        sampler=dict(type='RandomSampler', num=32, pos_fraction=0.25,
                     add_gt_as_proposals=True),
        pos_weight=-1, mask_size=28, debug=False)
    cfg = dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=64, pos_fraction=0.5),
                 pos_weight=-1),
        rpn_proposal=dict(nms_pre=200, nms_post=64, max_num=64, nms_thr=0.7,
                          min_bbox_size=0),
        rcnn=(
            [stage(t) for t in (0.5, 0.6, 0.7)[:num_stages]]
            if num_stages > 1 else stage(0.5)),
        stage_loss_weights=[1, 0.5, 0.25][:num_stages])
    return cfg


def _batch(with_mask=False, hw=(64, 96)):
    rng = np.random.default_rng(3)
    h, w = hw
    G = 4
    gt = np.zeros((G, 4), np.float32)
    gt[0] = [5, 5, 40, 40]
    gt[1] = [30, 20, 80, 60]
    gm = np.zeros((G,), bool)
    gm[:2] = True
    gl = np.zeros((G,), np.int64)
    gl[:2] = [1, 5]
    batch = dict(img=rng.normal(size=(h, w, 3)).astype(np.float32),
                 gt_bboxes=gt, gt_labels=gl, gt_mask=gm,
                 img_shape=np.array([h - 4.0, w - 6.0], np.float32),
                 pad_shape=np.array([float(h), float(w)], np.float32))
    if with_mask:
        masks = np.zeros((G, h, w), np.float32)
        masks[0, 5:41, 5:41] = 1
        masks[1, 20:61, 30:81] = 1
        batch["gt_masks"] = masks
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[None], batch)


def _leaf_delta(p0, p1):
    return sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
               for a, b in zip(jax.tree_util.tree_leaves(p0),
                               jax.tree_util.tree_leaves(p1)))


def test_mask_rcnn_train_step():
    eng = MaskRCNN(base_cfg(num_stages=1, with_mask=True),
                   _train_cfg(1, True), None)
    params = eng.init_params(jax.random.PRNGKey(0), (64, 96))
    trainer = TwoStageTrainer(eng, dict(optimizer=dict(lr=1e-2)),
                              steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 96)
    p0 = jax.tree_util.tree_map(np.asarray,
                                params["params"]["mask_head"])
    state2, logs = step(state, _batch(with_mask=True), jax.random.PRNGKey(1))
    for k in ("loss", "loss_rpn_cls", "loss_cls", "loss_bbox", "loss_mask"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["loss_mask"]) > 0
    assert _leaf_delta(p0, state2.params["params"]["mask_head"]) > 0


def test_cascade_train_step_three_stages():
    eng = CascadeRCNN(base_cfg(num_stages=3), _train_cfg(3), None)
    params = eng.init_params(jax.random.PRNGKey(2), (64, 96))
    trainer = TwoStageTrainer(eng, dict(optimizer=dict(lr=1e-2)),
                              steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 96)
    p0 = jax.tree_util.tree_map(
        np.asarray, params["params"]["bbox_head2"])
    state2, logs = step(state, _batch(), jax.random.PRNGKey(3))
    for s in range(3):
        assert np.isfinite(float(logs[f"loss_cls_s{s}"])), s
        assert np.isfinite(float(logs[f"loss_bbox_s{s}"])), s
    assert _leaf_delta(p0, state2.params["params"]["bbox_head2"]) > 0
