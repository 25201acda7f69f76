"""FCOS training: target assignment semantics + a full step."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.single_stage import FCOS
from hvrnet_tpu.engine.train_fcos import (FCOSTrainer, fcos_points,
                                          fcos_targets)


def test_fcos_target_assignment():
    points, lvl = fcos_points((64, 64), (8, 16))
    rr = jnp.asarray([[-1.0, 32.0], [32.0, 1e8]], jnp.float32)
    gt = jnp.asarray([[4.0, 4.0, 28.0, 28.0],     # small → level 0
                      [0.0, 0.0, 60.0, 60.0]])    # large → level 1
    gm = jnp.asarray([True, True])
    gl = jnp.asarray([3, 7])
    labels, tgt, ctr, pos = fcos_targets(points, lvl, rr, gt, gm, gl)
    labels = np.asarray(labels)
    lvl_np = np.asarray(lvl)
    pos_np = np.asarray(pos)
    # small box claims level-0 points, large box level-1 points
    assert (labels[(lvl_np == 0) & pos_np] != 7).all() or \
        (labels[(lvl_np == 0) & pos_np] == 3).any()
    assert (labels[(lvl_np == 1) & pos_np] == 7).all()
    # centerness peaks at the box center
    pts = np.asarray(points)
    centers = pos_np & (lvl_np == 1)
    if centers.any():
        best = np.argmax(np.asarray(ctr) * centers)
        assert abs(pts[best, 0] - 30) <= 16 and abs(pts[best, 1] - 30) <= 16
    # overlap region: the SMALLER gt wins (min-area rule)
    inside_small = ((pts[:, 0] > 4) & (pts[:, 0] < 28)
                    & (pts[:, 1] > 4) & (pts[:, 1] < 28) & (lvl_np == 0))
    claimed = labels[inside_small & pos_np]
    if claimed.size:
        assert (claimed == 3).all()


def test_fcos_train_step():
    model_cfg = dict(
        type='FCOS',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type='FCOSHead', num_classes=11, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=(8, 16, 32, 64, 128)))
    eng = FCOS(model_cfg, None, None)
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    trainer = FCOSTrainer(eng, dict(optimizer=dict(lr=1e-2)),
                          steps_per_epoch=10)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 64)

    rng = np.random.default_rng(0)
    G = 4
    gt = np.zeros((1, G, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 40]
    gm = np.zeros((1, G), bool)
    gm[0, 0] = True
    gl = np.zeros((1, G), np.int64)
    gl[0, 0] = 2
    batch = dict(imgs=rng.normal(size=(1, 1, 64, 64, 3)).astype(np.float32),
                 gt_bboxes=gt[None], gt_labels=gl[None], gt_mask=gm[None],
                 img_shape=np.array([[[64.0, 64.0]]], np.float32))
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["num_pos"]) >= 1
