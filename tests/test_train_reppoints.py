"""RepPoints: PointAssigner oracle, points2bbox checks, trainer step,
inference smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.train_reppoints import (RepPointsTrainer, point_assign,
                                               points2bbox, reppoints_points)


def point_assign_np(points, strides, gts, scale, pos_num):
    """Sequential reference loop (point_assigner.py:22-120)."""
    P = points.shape[0]
    lvl = np.floor(np.log2(strides)).astype(int)
    lo, hi = lvl.min(), lvl.max()
    ctr = (gts[:, :2] + gts[:, 2:]) / 2
    wh = np.clip(gts[:, 2:] - gts[:, :2], 1e-6, None)
    glvl = np.clip(((np.log2(wh[:, 0] / scale)
                     + np.log2(wh[:, 1] / scale)) / 2).astype(int), lo, hi)
    assigned = np.zeros(P, np.int64)
    best = np.full(P, np.inf)
    for g in range(gts.shape[0]):
        sel = np.nonzero(lvl == glvl[g])[0]
        d = np.linalg.norm((points[sel] - ctr[g]) / wh[g], axis=1)
        order = np.argsort(d, kind="stable")[:pos_num]
        idx = sel[order]
        better = d[order] < best[idx]
        assigned[idx[better]] = g + 1
        best[idx[better]] = d[order][better]
    return assigned


def test_point_assigner_matches_reference_loop():
    pts, st = reppoints_points((64, 96), (8, 16, 32))
    pts_np, st_np = np.asarray(pts), np.asarray(st)
    gts = np.array([[4, 4, 36, 36], [40, 16, 90, 60], [6, 30, 86, 62],
                    [50, 40, 58, 48]], np.float32)
    mask = np.array([1, 1, 1, 1], bool)
    got = np.asarray(point_assign(pts, st, jnp.asarray(gts),
                                  jnp.asarray(mask), scale=4, pos_num=3))
    ref = point_assign_np(pts_np, st_np, gts, 4, 3)
    np.testing.assert_array_equal(got, ref)


def test_point_assigner_respects_gt_mask():
    pts, st = reppoints_points((32, 32), (8, 16))
    gts = np.array([[4, 4, 28, 28], [4, 4, 28, 28]], np.float32)
    mask = np.array([1, 0], bool)
    got = np.asarray(point_assign(pts, st, jnp.asarray(gts),
                                  jnp.asarray(mask), pos_num=2))
    assert set(np.unique(got)) <= {0, 1}   # the padded gt never assigns


def test_points2bbox_minmax_and_moment():
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 10, (5, 18)).astype(np.float32)
    mm = np.asarray(points2bbox(jnp.asarray(pts), "minmax"))
    x = pts.reshape(5, 9, 2)[..., 0]
    y = pts.reshape(5, 9, 2)[..., 1]
    np.testing.assert_allclose(mm, np.stack(
        [x.min(1), y.min(1), x.max(1), y.max(1)], -1), rtol=1e-6)
    mt = jnp.asarray([0.1, -0.2])
    mo = np.asarray(points2bbox(jnp.asarray(pts), "moment", mt))
    hw = x.std(1, ddof=1) * np.exp(0.1)
    hh = y.std(1, ddof=1) * np.exp(-0.2)
    np.testing.assert_allclose(
        mo, np.stack([x.mean(1) - hw, y.mean(1) - hh,
                      x.mean(1) + hw, y.mean(1) + hh], -1), rtol=1e-4)


def test_reppoints_trainer_step_and_inference():
    from hvrnet_tpu.engine.single_stage import RepPointsDetector
    model_cfg = dict(
        type='RepPointsDetector',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type='RepPointsHead', num_classes=11, in_channels=32,
                       feat_channels=32, point_feat_channels=32,
                       stacked_convs=1, num_points=9,
                       point_strides=[8, 16, 32, 64, 128],
                       point_base_scale=4, transform_method='moment',
                       loss_bbox_init=dict(type='SmoothL1Loss',
                                           beta=1.0 / 9.0, loss_weight=0.5),
                       loss_bbox_refine=dict(type='SmoothL1Loss',
                                             beta=1.0 / 9.0,
                                             loss_weight=1.0)))
    train_cfg = dict(
        init=dict(assigner=dict(type='PointAssigner', scale=4, pos_num=1)),
        refine=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                  min_pos_iou=0.0)))
    eng = RepPointsDetector(model_cfg, train_cfg,
                            dict(score_thr=0.05,
                                 nms=dict(type='nms', iou_thr=0.5),
                                 max_per_img=10, nms_pre=100))
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    trainer = RepPointsTrainer(eng, dict(optimizer=dict(lr=1e-2)),
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
    p0 = np.asarray(params["params"]["bbox_head"]["pts_init_out"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_pts_init", "loss_pts_refine", "loss_cls"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["num_pos_init"]) >= 2
    p1 = np.asarray(
        state2.params["params"]["bbox_head"]["pts_init_out"]["bias"])
    assert not np.array_equal(p0, p1)

    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    dets, labels, mask = eng.simple_test(
        state2.params, img, np.array([64.0, 64.0], np.float32),
        np.array([1.0] * 4, np.float32))
    assert dets.shape == (10, 5)
    assert np.isfinite(np.asarray(dets)).all()
