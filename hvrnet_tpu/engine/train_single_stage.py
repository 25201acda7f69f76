"""Single-stage (dense-head) training — RetinaNet-style objective.

Zoo training path (reference `mmdet/models/detectors/single_stage.py`
forward_train + `anchor_head.py:loss`): multi-level anchors, MaxIoU
assignment without sampling (FocalLoss ⇒ PseudoSampler,
anchor_head.py:62,117-123), sigmoid focal classification over all valid
anchors normalized by the positive count, SmoothL1 box regression on
positives.  Fixed shapes: per-level anchor grids are compile-time constants;
eligibility is the inside-image mask.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.targets import max_iou_assign
from ..models.losses import sigmoid_focal_loss
from ..ops.anchors import AnchorGenerator
from ..ops.boxes import bbox2delta, bbox_overlaps, delta2bbox
from .optim import default_trainable_mask, make_optimizer, step_lr_schedule
from .train import TrainState, _smooth_l1


class RetinaTrainer:
    def __init__(self, engine, cfg: Dict[str, Any], mesh=None,
                 steps_per_epoch: int = 1000):
        self.engine = engine
        self.cfg = cfg
        self.mesh = mesh
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

    def _level_anchors(self, canvas_hw):
        head = self.engine.model_cfg["bbox_head"]
        strides = tuple(head.get("anchor_strides", (8, 16, 32, 64, 128)))
        ratios = tuple(head.get("anchor_ratios", (0.5, 1.0, 2.0)))
        octave = int(head.get("octave_base_scale", 4))
        spo = int(head.get("scales_per_octave", 3))
        scales = tuple(octave * 2 ** (i / spo) for i in range(spo))
        h, w = canvas_hw
        anchors = []
        for s in strides:
            gen = AnchorGenerator(s, scales, ratios)
            fh, fw = -(-h // s), -(-w // s)
            anchors.append(gen.grid_anchors((fh, fw), s))
        return jnp.asarray(np.concatenate(anchors, axis=0))

    def make_train_step(self, canvas_h: int, canvas_w: int):
        loss_fn = self._build_loss_fn(canvas_h, canvas_w)

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

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        anchors = self._level_anchors((canvas_h, canvas_w))
        tcfg = eng.train_cfg or {}
        acfg = tcfg.get("assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                         min_pos_iou=0.0))
        head = eng.model_cfg["bbox_head"]
        fg = int(head.get("num_classes", 81)) - 1
        means = tuple(head.get("target_means", (0., 0., 0., 0.)))
        stds = tuple(head.get("target_stds", (1., 1., 1., 1.)))
        # anchor_target.py:anchor_inside_flags — allowed_border < 0 disables
        # the inside-image filter (the reference RetinaNet config uses -1)
        allowed_border = float(tcfg.get("allowed_border", 0))

        def loss_fn(params, sample, rng):
            img = sample["imgs"]           # (1, H, W, 3)
            cls_maps, reg_maps = mod.apply(params, img)
            logits = jnp.concatenate(
                [c[0].reshape(-1, fg) for c in cls_maps], axis=0)
            deltas = jnp.concatenate(
                [r[0].reshape(-1, 4) for r in reg_maps], axis=0)
            h = sample["img_shape"][0][0]
            w = sample["img_shape"][0][1]
            if allowed_border < 0:
                inside = jnp.ones(anchors.shape[0], bool)
            else:
                inside = ((anchors[:, 0] >= -allowed_border)
                          & (anchors[:, 1] >= -allowed_border)
                          & (anchors[:, 2] < w + allowed_border)
                          & (anchors[:, 3] < h + allowed_border))
            ar = max_iou_assign(anchors, sample["gt_bboxes"][0],
                                sample["gt_mask"][0], sample["gt_labels"][0],
                                float(acfg["pos_iou_thr"]),
                                float(acfg["neg_iou_thr"]),
                                float(acfg["min_pos_iou"]), box_mask=inside)
            pos = ar.gt_inds > 0
            valid = ar.gt_inds >= 0
            num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
            fl = sigmoid_focal_loss(logits, ar.labels)
            loss_cls = (fl.sum(-1) * valid.astype(jnp.float32)).sum() / num_pos
            gi = jnp.maximum(ar.gt_inds - 1, 0)
            t = bbox2delta(anchors, sample["gt_bboxes"][0][gi][:, :4],
                           means, stds)
            l1 = _smooth_l1(deltas, t, 1.0 / 9.0).sum(-1)
            loss_bbox = (l1 * pos.astype(jnp.float32)).sum() / num_pos
            total = loss_cls + loss_bbox
            return total, dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                               num_pos=num_pos)

        return loss_fn


def free_anchor_loss(cls_prob, bbox_preds, anchors, gt_bboxes, gt_mask,
                     gt_labels, num_fg_classes,
                     target_means=(0., 0., 0., 0.),
                     target_stds=(0.1, 0.1, 0.2, 0.2),
                     pre_anchor_topk=50, bbox_thr=0.6, gamma=2.0, alpha=0.5,
                     smoothl1_beta=0.11, bbox_loss_weight=0.75):
    """FreeAnchor's detection-customized likelihood for ONE image
    (reference `anchor_heads/free_anchor_retina_head.py:35-188`), with the
    reference's dynamic gt lists replaced by fixed gt slots + validity masks
    and the sparse per-class max by a `segment_max` over gt labels.

    cls_prob: (A, C) sigmoid class probabilities; bbox_preds: (A, 4);
    anchors: (A, 4); gt_labels 1-based.  Returns (positive_bag_loss_sum,
    negative_bag_loss_sum, num_pos) — normalize across the batch as the
    reference does (sum_pos / max(1, Σnum_pos), sum_neg / max(1, Σnum_pos·K)).
    """
    A = anchors.shape[0]
    labels0 = jnp.maximum(gt_labels.astype(jnp.int32) - 1, 0)
    gt_valid = gt_mask.astype(cls_prob.dtype)

    # P{a_j → b_i}: anchor-box probability from predicted-box IoU (:73-85)
    pred_boxes = jax.lax.stop_gradient(
        delta2bbox(anchors, bbox_preds, target_means, target_stds))
    obj_iou = bbox_overlaps(gt_bboxes[:, :4], pred_boxes) * gt_valid[:, None]
    t2 = jnp.maximum(obj_iou.max(axis=1, keepdims=True), bbox_thr + 1e-12)
    obj_box_prob = jnp.clip((obj_iou - bbox_thr) / (t2 - bbox_thr), 0.0, 1.0)
    obj_box_prob = obj_box_prob * gt_valid[:, None]

    # image_box_prob (A, C): per-class max over gts of that class (:87-123);
    # invalid gt rows get segment id C and are dropped.
    seg_ids = jnp.where(gt_mask, labels0, num_fg_classes)
    image_box_prob = jax.ops.segment_max(
        obj_box_prob, seg_ids, num_segments=num_fg_classes + 1,
        indices_are_sorted=False)[:num_fg_classes]          # (C, A)
    image_box_prob = jnp.maximum(image_box_prob, 0.0).T     # (A, C)
    image_box_prob = jax.lax.stop_gradient(image_box_prob)

    # bags: top-K anchors per gt by anchor IoU (:126-133)
    anchor_iou = bbox_overlaps(gt_bboxes[:, :4], anchors)
    anchor_iou = jnp.where(gt_mask[:, None], anchor_iou, -1.0)
    _, matched = jax.lax.top_k(anchor_iou, pre_anchor_topk)   # (G, K)

    matched_cls_prob = jnp.take_along_axis(
        cls_prob[matched], labels0[:, None, None].repeat(pre_anchor_topk, 1),
        axis=2)[..., 0]                                       # (G, K)
    matched_anchors = anchors[matched]                        # (G, K, 4)
    tgt = bbox2delta(matched_anchors.reshape(-1, 4),
                     jnp.repeat(gt_bboxes[:, :4], pre_anchor_topk, axis=0),
                     target_means, target_stds).reshape(matched_anchors.shape)
    l1 = bbox_loss_weight * _smooth_l1(
        bbox_preds[matched], tgt, smoothl1_beta).sum(-1)      # (G, K)
    matched_box_prob = jnp.exp(-l1)

    # positive bag: -alpha·log(Mean-max(P_cls · P_loc)) per gt (:170-178)
    mp = matched_cls_prob * matched_box_prob
    w = 1.0 / jnp.clip(1.0 - mp, 1e-12, None)
    w = w / w.sum(axis=1, keepdims=True)
    bag_prob = (w * mp).sum(axis=1)
    pos_loss = -alpha * jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))
    pos_loss_sum = (pos_loss * gt_valid).sum()

    # negative bag: focal-weighted BCE towards 0 (:180-188)
    prob = cls_prob * (1.0 - image_box_prob)
    neg = prob ** gamma * (-jnp.log(jnp.clip(1.0 - prob, 1e-12, 1.0)))
    neg_loss_sum = (1.0 - alpha) * neg.sum()
    return pos_loss_sum, neg_loss_sum, gt_mask.sum()


class FreeAnchorTrainer(RetinaTrainer):
    """FreeAnchorRetinaHead training objective on the RetinaNet plumbing."""

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        anchors = self._level_anchors((canvas_h, canvas_w))
        head = eng.model_cfg["bbox_head"]
        fg = int(head.get("num_classes", 81)) - 1
        kw = dict(
            num_fg_classes=fg,
            target_means=tuple(head.get("target_means", (0., 0., 0., 0.))),
            target_stds=tuple(head.get("target_stds", (0.1, 0.1, 0.2, 0.2))),
            pre_anchor_topk=int(head.get("pre_anchor_topk", 50)),
            bbox_thr=float(head.get("bbox_thr", 0.6)),
            gamma=float(head.get("gamma", 2.0)),
            alpha=float(head.get("alpha", 0.5)),
            smoothl1_beta=float(head.get("loss_bbox", {}).get("beta", 0.11)),
            bbox_loss_weight=float(head.get("loss_bbox", {}).get(
                "loss_weight", 0.75)))
        K = kw["pre_anchor_topk"]

        def loss_fn(params, sample, rng):
            cls_maps, reg_maps = mod.apply(params, sample["imgs"])
            cls_prob = jax.nn.sigmoid(jnp.concatenate(
                [c[0].reshape(-1, fg) for c in cls_maps], axis=0)
                .astype(jnp.float32))
            deltas = jnp.concatenate(
                [r[0].reshape(-1, 4) for r in reg_maps], axis=0
            ).astype(jnp.float32)
            pos_sum, neg_sum, n_pos = free_anchor_loss(
                cls_prob, deltas, anchors, sample["gt_bboxes"][0],
                sample["gt_mask"][0], sample["gt_labels"][0], **kw)
            npos = jnp.maximum(n_pos.astype(jnp.float32), 1.0)
            loss_pos = pos_sum / npos
            loss_neg = neg_sum / (npos * K)
            return loss_pos + loss_neg, dict(
                positive_bag_loss=loss_pos, negative_bag_loss=loss_neg,
                num_pos=n_pos.astype(jnp.float32))

        return loss_fn


class SSDTrainer(RetinaTrainer):
    """SSDHead training objective (reference `anchor_heads/ssd_head.py:loss`):
    softmax CE with 3:1 hard-negative mining + SmoothL1 on positives, over
    the SSD anchor scheme.  Anchors are built at trace time from the actual
    per-level map shapes (SSD strides 100/300 don't ceil-divide the canvas)."""

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        from ..ops.anchors import ssd_anchor_generators_from_cfg
        from .train_mask import ssd_targets_and_loss
        eng = self.engine
        mod = eng.module
        head = eng.model_cfg["bbox_head"]
        nc = int(head.get("num_classes", 81))
        means = tuple(head.get("target_means", (0., 0., 0., 0.)))
        stds = tuple(head.get("target_stds", (0.1, 0.1, 0.2, 0.2)))
        gens, strides = ssd_anchor_generators_from_cfg(head)
        tcfg = eng.train_cfg or {}
        neg_pos_ratio = int(tcfg.get("neg_pos_ratio", 3))
        beta = float(tcfg.get("smoothl1_beta", 1.0))

        def loss_fn(params, sample, rng):
            cls_maps, reg_maps = mod.apply(params, sample["imgs"])
            logits, deltas, anchors = [], [], []
            for lvl, (cm, rm) in enumerate(zip(cls_maps, reg_maps)):
                logits.append(cm[0].reshape(-1, nc))
                deltas.append(rm[0].reshape(-1, 4))
                anchors.append(jnp.asarray(gens[lvl].grid_anchors(
                    cm.shape[1:3], strides[lvl])))
            logits = jnp.concatenate(logits, axis=0).astype(jnp.float32)
            deltas = jnp.concatenate(deltas, axis=0).astype(jnp.float32)
            anchors = jnp.concatenate(anchors, axis=0)
            loss_cls, loss_bbox = ssd_targets_and_loss(
                logits, deltas, anchors, sample["gt_bboxes"][0],
                sample["gt_mask"][0], sample["gt_labels"][0],
                neg_pos_ratio=neg_pos_ratio, target_means=means,
                target_stds=stds, smoothl1_beta=beta)
            return loss_cls + loss_bbox, dict(loss_cls=loss_cls,
                                              loss_bbox=loss_bbox)

        return loss_fn
