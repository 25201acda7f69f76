"""FCOS training objective (reference `mmdet/models/anchor_heads/fcos_head.py`
target assignment + losses): anchor-free per-point assignment —

  * a point is positive for a GT box if it lies inside the box AND the max
    regression distance falls inside the level's regress_range;
  * among candidate GTs the smallest-area one wins;
  * losses: sigmoid focal (cls), IoU loss on decoded boxes (reg, weighted by
    centerness target), BCE (centerness) — all normalized by #positives.

Fixed shapes: per-level point grids are compile-time constants; GT sets are
padded + masked.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.losses import (binary_cross_entropy_with_logits,
                             sigmoid_focal_loss)
from .optim import default_trainable_mask, make_optimizer, step_lr_schedule
from .train import TrainState

INF = 1e8
DEFAULT_REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                          (512, INF))


def fcos_points(canvas_hw, strides):
    """Per-level point centers (stride/2 offset, fcos_head.py get_points)."""
    h, w = canvas_hw
    pts, ranges_idx = [], []
    for li, s in enumerate(strides):
        fh, fw = -(-h // s), -(-w // s)
        ys = (np.arange(fh) * s + s // 2).astype(np.float32)
        xs = (np.arange(fw) * s + s // 2).astype(np.float32)
        xx, yy = np.meshgrid(xs, ys)
        pts.append(np.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        ranges_idx.append(np.full(fh * fw, li, np.int32))
    return (jnp.asarray(np.concatenate(pts)),
            jnp.asarray(np.concatenate(ranges_idx)))


def fcos_targets(points, level_idx, regress_ranges, gt_bboxes, gt_mask,
                 gt_labels):
    """Per-point (label, ltrb target, centerness target, pos mask)."""
    px = points[:, 0][:, None]                     # (P, 1)
    py = points[:, 1][:, None]
    l = px - gt_bboxes[None, :, 0]                 # (P, G)
    t = py - gt_bboxes[None, :, 1]
    r = gt_bboxes[None, :, 2] - px
    b = gt_bboxes[None, :, 3] - py
    ltrb = jnp.stack([l, t, r, b], axis=-1)        # (P, G, 4)
    inside = ltrb.min(axis=-1) > 0
    max_dist = ltrb.max(axis=-1)
    lo = regress_ranges[level_idx][:, 0][:, None]
    hi = regress_ranges[level_idx][:, 1][:, None]
    in_range = (max_dist >= lo) & (max_dist <= hi)
    areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
             * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))[None, :]
    cand = inside & in_range & gt_mask[None, :]
    areas = jnp.where(cand, areas, INF)
    gi = areas.argmin(axis=1)                      # (P,)
    pos = cand.any(axis=1)
    labels = jnp.where(pos, gt_labels[gi], 0)
    tgt = jnp.take_along_axis(ltrb, gi[:, None, None], axis=1)[:, 0, :]
    lr_min = jnp.minimum(tgt[:, 0], tgt[:, 2])
    lr_max = jnp.maximum(tgt[:, 0], tgt[:, 2])
    tb_min = jnp.minimum(tgt[:, 1], tgt[:, 3])
    tb_max = jnp.maximum(tgt[:, 1], tgt[:, 3])
    centerness = jnp.sqrt(jnp.clip(
        (lr_min / jnp.maximum(lr_max, 1e-6))
        * (tb_min / jnp.maximum(tb_max, 1e-6)), 0.0, None))
    return labels, tgt, centerness, pos


def fovea_level_targets(gt_bboxes, gt_mask, gt_labels, feat_hw, stride,
                        base_len, lower, upper, sigma=0.4):
    """FoveaBox per-level targets for one image (reference
    fovea_head.py:254-312): gts scale-assigned by sqrt-area to the level
    paint their shrunk (σ) fovea region; where regions overlap the
    smallest-area gt wins (the reference paints in descending-area order).
    Returns (labels (h·w,), log-space ltrb targets (h·w, 4), pos (h·w,)).
    """
    h, w = feat_hw
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    areas = jnp.sqrt((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                     * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
    hit = (areas >= lower) & (areas <= upper) & gt_mask
    gs = gt_bboxes / stride
    half_w = 0.5 * (gs[:, 2] - gs[:, 0])
    half_h = 0.5 * (gs[:, 3] - gs[:, 1])
    px1 = jnp.clip(jnp.ceil(gs[:, 0] + (1 - sigma) * half_w - 0.5), 0, w - 1)
    px2 = jnp.clip(jnp.floor(gs[:, 0] + (1 + sigma) * half_w - 0.5), 0, w - 1)
    py1 = jnp.clip(jnp.ceil(gs[:, 1] + (1 - sigma) * half_h - 0.5), 0, h - 1)
    py2 = jnp.clip(jnp.floor(gs[:, 1] + (1 + sigma) * half_h - 0.5), 0, h - 1)
    cover = ((xx[None] >= px1[:, None, None]) & (xx[None] <= px2[:, None, None])
             & (yy[None] >= py1[:, None, None]) & (yy[None] <= py2[:, None, None])
             & hit[:, None, None])                              # (G, h, w)
    pri = jnp.where(cover, areas[:, None, None], INF)
    winner = pri.argmin(axis=0)                                 # (h, w)
    pos = cover.any(axis=0)
    labels = jnp.where(pos, gt_labels[winner], 0).reshape(-1)
    gt_w = gt_bboxes[winner]                                    # (h, w, 4)
    # points are (i + 0.5) in feature coords (get_points:172-184)
    sx = stride * (xx + 0.5)
    sy = stride * (yy + 0.5)
    t = jnp.stack([(sx - gt_w[..., 0]) / base_len,
                   (sy - gt_w[..., 1]) / base_len,
                   (gt_w[..., 2] - sx) / base_len,
                   (gt_w[..., 3] - sy) / base_len], axis=-1)
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    t = jnp.where(pos[..., None], t, 0.0)                       # log(1) = 0
    return labels, t.reshape(-1, 4), pos.reshape(-1)


class FCOSTrainer:
    def __init__(self, engine, cfg: Dict[str, Any], mesh=None,
                 steps_per_epoch: int = 1000):
        self.engine = engine
        opt = cfg.get("optimizer", dict(lr=0.01, momentum=0.9,
                                        weight_decay=1e-4))
        lrc = cfg.get("lr_config", dict(step=[8, 11], warmup_iters=500,
                                        warmup_ratio=1.0 / 3))
        self.schedule = step_lr_schedule(
            float(opt["lr"]), steps_per_epoch, list(lrc.get("step", [])),
            warmup_iters=int(lrc.get("warmup_iters", 500)),
            warmup_ratio=float(lrc.get("warmup_ratio", 1.0 / 3)))
        self._opt_kw = dict(momentum=float(opt.get("momentum", 0.9)),
                            weight_decay=float(opt.get("weight_decay", 1e-4)),
                            clip_norm=float(cfg.get("optimizer_config", {})
                                            .get("grad_clip", {})
                                            .get("max_norm", 35.0)),
                            paramwise_options=opt.get("paramwise_options"))
        self.tx = None

    def create_state(self, params) -> TrainState:
        mask = default_trainable_mask(params, frozen_stages=1)
        self.tx = make_optimizer(self.schedule, trainable_mask=mask,
                                 params=params, **self._opt_kw)
        return TrainState(params, self.tx.init(params),
                          jnp.zeros((), jnp.int32))

    def make_train_step(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        head = eng.model_cfg["bbox_head"]
        strides = tuple(head.get("strides", (8, 16, 32, 64, 128)))
        fg = int(head.get("num_classes", 81)) - 1
        points, level_idx = fcos_points((canvas_h, canvas_w), strides)
        rr = jnp.asarray(np.asarray(DEFAULT_REGRESS_RANGES[:len(strides)],
                                    np.float32))

        def loss_fn(params, sample, rng):
            img = sample["imgs"]
            cls_maps, reg_maps, ctr_maps = mod.apply(params, img)
            logits = jnp.concatenate(
                [c[0].reshape(-1, fg) for c in cls_maps], axis=0)
            # per-level stride scaling of the distance predictions
            regs = jnp.concatenate(
                [r[0].reshape(-1, 4) * s for r, s in zip(reg_maps, strides)],
                axis=0)
            ctrs = jnp.concatenate(
                [c[0].reshape(-1) for c in ctr_maps], axis=0)

            labels, tgt, ctr_tgt, pos = fcos_targets(
                points, level_idx, rr, sample["gt_bboxes"][0],
                sample["gt_mask"][0], sample["gt_labels"][0])
            num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

            fl = sigmoid_focal_loss(logits, labels)
            loss_cls = fl.sum() / num_pos

            # IoU loss between decoded pred/target boxes at positive points
            def decode(d):
                return jnp.stack([points[:, 0] - d[:, 0], points[:, 1] - d[:, 1],
                                  points[:, 0] + d[:, 2], points[:, 1] + d[:, 3]],
                                 axis=-1)
            pb = decode(regs)
            tb = decode(tgt)
            lt = jnp.maximum(pb[:, :2], tb[:, :2])
            rb = jnp.minimum(pb[:, 2:], tb[:, 2:])
            wh = jnp.clip(rb - lt, 0, None)
            inter = wh[:, 0] * wh[:, 1]
            ap = jnp.clip((pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1]), 0, None)
            at = jnp.clip((tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1]), 0, None)
            iou = inter / jnp.maximum(ap + at - inter, 1e-6)
            w = ctr_tgt * pos.astype(jnp.float32)
            loss_reg = (-jnp.log(jnp.clip(iou, 1e-6, None)) * w).sum() \
                / jnp.maximum(w.sum(), 1e-6)

            bce = binary_cross_entropy_with_logits(ctrs, ctr_tgt)
            loss_ctr = (bce * pos.astype(jnp.float32)).sum() / num_pos

            total = loss_cls + loss_reg + loss_ctr
            return total, dict(loss_cls=loss_cls, loss_bbox=loss_reg,
                               loss_centerness=loss_ctr, num_pos=num_pos)

        def step(state, batch, rng):
            sample = jax.tree_util.tree_map(lambda x: x[0], batch)
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, sample, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params, opt_state, state.step + 1),
                    dict(logs, loss=loss))

        return jax.jit(step, donate_argnums=(0,))

class FoveaTrainer:
    """FoveaBox training step (fovea_head.py:186-231): focal cls over all
    points (averaged by #pos + #imgs), SmoothL1 on the log-space ltrb at
    positives."""

    def __init__(self, engine, cfg: Dict[str, Any], mesh=None,
                 steps_per_epoch: int = 1000):
        FCOSTrainer.__init__(self, engine, cfg, mesh, steps_per_epoch)

    create_state = FCOSTrainer.create_state

    def make_train_step(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        head = eng.model_cfg["bbox_head"]
        strides = tuple(head.get("strides", (4, 8, 16, 32, 64)))
        base_lens = tuple(head.get("base_edge_list", (16, 32, 64, 128, 256)))
        ranges = tuple(tuple(r) for r in head.get(
            "scale_ranges", ((8, 32), (16, 64), (32, 128), (64, 256),
                             (128, 512))))
        sigma = float(head.get("sigma", 0.4))
        fg = int(head.get("num_classes", 81)) - 1
        beta = float((head.get("loss_bbox") or {}).get("beta", 0.11))
        bbox_w = float((head.get("loss_bbox") or {}).get("loss_weight", 0.1))

        def loss_fn(params, sample, rng):
            cls_maps, reg_maps = mod.apply(params, sample["imgs"])
            lbl_parts, tgt_parts, pos_parts, logit_parts, reg_parts = (
                [], [], [], [], [])
            for lvl, (cm, rm) in enumerate(zip(cls_maps, reg_maps)):
                labels, tgt, pos = fovea_level_targets(
                    sample["gt_bboxes"][0], sample["gt_mask"][0],
                    sample["gt_labels"][0], cm.shape[1:3], strides[lvl],
                    base_lens[lvl], ranges[lvl][0], ranges[lvl][1], sigma)
                lbl_parts.append(labels)
                tgt_parts.append(tgt)
                pos_parts.append(pos)
                logit_parts.append(cm[0].reshape(-1, fg).astype(jnp.float32))
                reg_parts.append(rm[0].reshape(-1, 4).astype(jnp.float32))
            labels = jnp.concatenate(lbl_parts)
            tgt = jnp.concatenate(tgt_parts)
            pos = jnp.concatenate(pos_parts)
            logits = jnp.concatenate(logit_parts)
            regs = jnp.concatenate(reg_parts)
            num_pos = pos.sum().astype(jnp.float32)

            fl = sigmoid_focal_loss(logits, labels)
            loss_cls = fl.sum() / (num_pos + 1.0)      # + num_imgs (=1)
            diff = jnp.abs(regs - tgt)
            l1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                           diff - 0.5 * beta).sum(-1)
            loss_bbox = bbox_w * (l1 * pos.astype(jnp.float32)).sum() \
                / jnp.maximum(num_pos, 1.0)
            total = loss_cls + loss_bbox
            return total, dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                               num_pos=num_pos)

        def step(state, batch, rng):
            sample = jax.tree_util.tree_map(lambda x: x[0], batch)
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, sample, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params, opt_state, state.step + 1),
                    dict(logs, loss=loss))

        return jax.jit(step, donate_argnums=(0,))
