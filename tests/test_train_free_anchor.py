"""FreeAnchor loss vs a direct numpy oracle of the reference math, plus a
trainer smoke test."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.train_single_stage import (FreeAnchorTrainer,
                                                  free_anchor_loss)
from hvrnet_tpu.ops.boxes import bbox_overlaps, delta2bbox, bbox2delta


def _smooth_l1_np(x, t, beta):
    d = np.abs(x - t)
    return np.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def free_anchor_np(cls_prob, deltas, anchors, gts, labels0, K, t1, gamma,
                   alpha, beta, lw, C):
    """Direct transcription of free_anchor_retina_head.py:35-188 (valid gts
    only, dynamic shapes)."""
    G = gts.shape[0]
    pred = np.asarray(delta2bbox(jnp.asarray(anchors), jnp.asarray(deltas),
                                 (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)))
    iou = np.asarray(bbox_overlaps(jnp.asarray(gts), jnp.asarray(pred)),
                     dtype=np.float64)
    t2 = np.maximum(iou.max(axis=1, keepdims=True), t1 + 1e-9)
    obp = np.clip((iou - t1) / (t2 - t1), 0, 1)
    image_box_prob = np.zeros((anchors.shape[0], C), np.float64)
    for i in range(G):
        c = labels0[i]
        image_box_prob[:, c] = np.maximum(image_box_prob[:, c], obp[i])

    aiou = np.asarray(bbox_overlaps(jnp.asarray(gts), jnp.asarray(anchors)))
    pos_sum = 0.0
    for i in range(G):
        matched = np.argsort(-aiou[i])[:K]
        mcp = cls_prob[matched, labels0[i]]
        tgt = np.asarray(bbox2delta(jnp.asarray(anchors[matched]),
                                    jnp.asarray(np.tile(gts[i], (K, 1))),
                                    (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)))
        l1 = lw * _smooth_l1_np(deltas[matched], tgt, beta).sum(-1)
        mp = mcp * np.exp(-l1)
        w = 1.0 / np.clip(1 - mp, 1e-12, None)
        w = w / w.sum()
        bag = (w * mp).sum()
        pos_sum += -alpha * np.log(np.clip(bag, 1e-12, 1))

    prob = cls_prob * (1 - image_box_prob)
    neg_sum = (1 - alpha) * (prob ** gamma
                             * -np.log(np.clip(1 - prob, 1e-12, 1))).sum()
    return pos_sum, neg_sum


def test_free_anchor_loss_matches_oracle():
    rng = np.random.default_rng(11)
    A, C, K = 60, 7, 8
    cx = rng.uniform(10, 110, A)
    cy = rng.uniform(10, 110, A)
    wh = rng.uniform(8, 40, (A, 2))
    anchors = np.stack([cx - wh[:, 0], cy - wh[:, 1],
                        cx + wh[:, 0], cy + wh[:, 1]], 1).astype(np.float32)
    deltas = rng.normal(0, 0.3, (A, 4)).astype(np.float32)
    cls_prob = rng.uniform(0.01, 0.99, (A, C)).astype(np.float32)
    Gs = 6  # slots; 4 valid
    gts = np.zeros((Gs, 4), np.float32)
    gts[:4] = [[20, 20, 60, 70], [50, 40, 100, 90],
               [10, 60, 45, 100], [70, 10, 120, 55]]
    gmask = np.array([1, 1, 1, 1, 0, 0], bool)
    glabels = np.array([1, 3, 3, 7, 0, 0], np.int64)  # 1-based

    pos, neg, npos = free_anchor_loss(
        jnp.asarray(cls_prob), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(gts), jnp.asarray(gmask), jnp.asarray(glabels),
        num_fg_classes=C, pre_anchor_topk=K, bbox_thr=0.6,
        gamma=2.0, alpha=0.5, smoothl1_beta=0.11, bbox_loss_weight=0.75)
    ref_pos, ref_neg = free_anchor_np(
        cls_prob.astype(np.float64), deltas.astype(np.float64),
        anchors.astype(np.float64), gts[:4].astype(np.float64),
        glabels[:4] - 1, K, 0.6, 2.0, 0.5, 0.11, 0.75, C)
    assert int(npos) == 4
    np.testing.assert_allclose(float(pos), ref_pos, rtol=2e-4)
    np.testing.assert_allclose(float(neg), ref_neg, rtol=2e-4)


def test_free_anchor_trainer_step():
    from hvrnet_tpu.engine.single_stage import RetinaNet
    model_cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(type='FreeAnchorRetinaHead', num_classes=11,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       octave_base_scale=4, scales_per_octave=3,
                       anchor_ratios=[0.5, 1.0, 2.0],
                       anchor_strides=[8, 16, 32, 64, 128],
                       pre_anchor_topk=16,
                       target_means=[0., 0., 0., 0.],
                       target_stds=[0.1, 0.1, 0.2, 0.2]))
    eng = RetinaNet(model_cfg, dict(), None)
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    trainer = FreeAnchorTrainer(eng, dict(optimizer=dict(lr=1e-2)),
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
    p0 = np.asarray(params["params"]["bbox_head"]["retina_cls"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["num_pos"]) == 2
    p1 = np.asarray(state2.params["params"]["bbox_head"]["retina_cls"]["bias"])
    assert not np.array_equal(p0, p1)
