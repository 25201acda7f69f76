"""Guided-anchoring training objective (GA-Retina / GA-RPN heads).

Reference semantics (`mmdet/models/anchor_heads/guided_anchor_head.py:364-514`
+ `mmdet/core/anchor/guided_anchor_target.py`):

  * **Location loss** — each gt paints a center region (target 1, weight 1),
    an ignore ring (weight 0) and leaves the rest negative (weight 0.1) on
    its scale-assigned pyramid level, plus ignore rings on the two adjacent
    levels; sigmoid focal loss, averaged by Σ(h·w)/200.
  * **Shape loss** — squares are assigned to gts by the max IoU of their
    `approxs_per_octave` approx anchors (ApproxMaxIoUAssigner); positives
    regress (dw, dh) so that `delta2bbox(square, [0,0,dw,dh])` bounds the gt
    (BoundedIoULoss, averaged by the positive count).
  * **Cls/bbox losses** — the standard anchor-head objective evaluated on
    the *guided* anchors (squares reshaped by the detached shape branch).

TPU adaptations: fixed gt slots with validity masks; region painting is done
with coordinate-grid comparisons instead of dynamic slicing (XLA-friendly);
overlapping objects resolve by priority center > ignore > adjacent-ignore >
negative rather than the reference's sequential per-gt overwrite (identical
whenever regions of distinct gts don't overlap).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.targets import max_iou_assign
from ..models.losses import BoundedIoULoss, sigmoid_focal_loss
from ..ops.anchors import AnchorGenerator
from ..ops.boxes import bbox2delta, bbox_overlaps, delta2bbox
from .train import TrainState, _smooth_l1
from .train_single_stage import RetinaTrainer


def _calc_region(gt, ratio, fh, fw):
    """calc_region (guided_anchor_target.py:7-29) on a (4,) box, jnp."""
    x1 = jnp.clip(jnp.round((1 - ratio) * gt[0] + ratio * gt[2]), 0, fw - 1)
    y1 = jnp.clip(jnp.round((1 - ratio) * gt[1] + ratio * gt[3]), 0, fh - 1)
    x2 = jnp.clip(jnp.round(ratio * gt[0] + (1 - ratio) * gt[2]), 0, fw - 1)
    y2 = jnp.clip(jnp.round(ratio * gt[1] + (1 - ratio) * gt[3]), 0, fh - 1)
    return x1, y1, x2, y2


def ga_loc_targets(gt_bboxes: jnp.ndarray, gt_mask: jnp.ndarray,
                   featmap_sizes: Sequence[Tuple[int, int]],
                   strides: Sequence[int], octave_base_scale: int,
                   center_ratio: float = 0.2, ignore_ratio: float = 0.5):
    """Per-level (h·w,) loc targets/weights for ONE image
    (guided_anchor_target.py:32-131).  Returns (targets, weights,
    loc_avg_factor)."""
    num_lvls = len(featmap_sizes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt((gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1)
                     * (gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1))
    min_sz = float(octave_base_scale * strides[0])
    tl = jnp.floor(jnp.log2(jnp.maximum(scale, 1e-6)) - np.log2(min_sz) + 0.5)
    target_lvls = jnp.clip(tl, 0, num_lvls - 1).astype(jnp.int32)

    targets, weights = [], []
    for lvl in range(num_lvls):
        fh, fw = featmap_sizes[lvl]
        yy, xx = jnp.meshgrid(jnp.arange(fh, dtype=jnp.float32),
                              jnp.arange(fw, dtype=jnp.float32),
                              indexing="ij")

        def regions(gt, is_lvl, ratio, stride):
            x1, y1, x2, y2 = _calc_region(gt[:4] / stride, ratio, fh, fw)
            inside = ((yy >= y1) & (yy <= y2) & (xx >= x1) & (xx <= x2))
            return inside & is_lvl

        on_lvl = (target_lvls == lvl) & gt_mask
        ctr = jax.vmap(lambda g, m: regions(g, m, r1, strides[lvl]))(
            gt_bboxes, on_lvl).any(axis=0)
        ign = jax.vmap(lambda g, m: regions(g, m, r2, strides[lvl]))(
            gt_bboxes, on_lvl).any(axis=0)
        # adjacent-level ignore map (:104-121): gts homed one level up/down
        adj = (gt_mask & ((target_lvls == lvl + 1) | (target_lvls == lvl - 1)))
        ign_map = jax.vmap(lambda g, m: regions(g, m, r2, strides[lvl]))(
            gt_bboxes, adj).any(axis=0)
        t = ctr.astype(jnp.float32)
        w = jnp.where(ctr, 1.0,
                      jnp.where(ign, 0.0, jnp.where(ign_map, 0.0, 0.1)))
        targets.append(t.reshape(-1))
        weights.append(w.reshape(-1))
    loc_avg_factor = sum(h * w for h, w in featmap_sizes) / 200.0
    return targets, weights, loc_avg_factor


def ga_shape_target_single(approxs: jnp.ndarray, squares: jnp.ndarray,
                           inside: jnp.ndarray, gt_bboxes: jnp.ndarray,
                           gt_mask: jnp.ndarray, approxs_per_octave: int,
                           pos_iou_thr: float = 0.5, neg_iou_thr: float = 0.4,
                           min_pos_iou: float = 0.0):
    """Fixed-shape ga_shape_target for one image (PseudoSampler path,
    guided_anchor_target.py:220-290): squares assigned by the max IoU over
    their approx group.  Returns (bbox_gts (S,4), pos_weights (S,), fg_num).
    """
    S = squares.shape[0]
    ov = bbox_overlaps(gt_bboxes[:, :4], approxs)          # (G, S*opo)
    ov = ov.reshape(ov.shape[0], S, approxs_per_octave).max(axis=2)
    ov = jnp.where(gt_mask[:, None], ov, -1.0)
    ov = jnp.where(inside[None, :], ov, -1.0)
    ar = max_iou_assign(squares, gt_bboxes, gt_mask, None,
                        pos_iou_thr, neg_iou_thr, min_pos_iou,
                        box_mask=inside, overlaps=ov)
    pos = ar.gt_inds > 0
    gi = jnp.maximum(ar.gt_inds - 1, 0)
    bbox_gts = jnp.where(pos[:, None], gt_bboxes[gi][:, :4], 0.0)
    fg_num = jnp.maximum(pos.sum(), 1)
    return bbox_gts, pos.astype(jnp.float32), fg_num


class GATrainer(RetinaTrainer):
    """GA-Retina training step: loc + shape + guided-anchor cls/bbox losses
    (guided_anchor_head.py:402-514)."""

    def _ga_generators(self, canvas_hw):
        head = self.engine.model_cfg["bbox_head"]
        strides = tuple(head.get("anchor_strides", (8, 16, 32, 64, 128)))
        ratios = tuple(head.get("octave_ratios",
                                head.get("anchor_ratios", (0.5, 1.0, 2.0))))
        octave = int(head.get("octave_base_scale", 8))
        spo = int(head.get("scales_per_octave", 3))
        scales = tuple(octave * 2 ** (i / spo) for i in range(spo))
        h, w = canvas_hw
        sizes, approxs, squares = [], [], []
        for s in strides:
            fh, fw = -(-h // s), -(-w // s)
            sizes.append((fh, fw))
            approxs.append(AnchorGenerator(s, scales, ratios)
                           .grid_anchors((fh, fw), s))
            squares.append(AnchorGenerator(s, (octave,), (1.0,))
                           .grid_anchors((fh, fw), s))
        opo = len(scales) * len(ratios)
        return (sizes, strides, octave, opo,
                [jnp.asarray(a) for a in approxs],
                [jnp.asarray(sq) for sq in squares])

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        (sizes, strides, octave, opo, approxs_l, squares_l) = \
            self._ga_generators((canvas_h, canvas_w))
        tcfg = eng.train_cfg or {}
        ga_a = tcfg.get("ga_assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                            min_pos_iou=0.0))
        acfg = tcfg.get("assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                         min_pos_iou=0.0))
        center_ratio = float(tcfg.get("center_ratio", 0.2))
        ignore_ratio = float(tcfg.get("ignore_ratio", 0.5))
        head = eng.model_cfg["bbox_head"]
        fg = int(head.get("num_classes", 81)) - 1
        a_means = tuple(head.get("anchoring_means", (0., 0., 0., 0.)))
        a_stds = tuple(head.get("anchoring_stds", (1., 1., 1., 1.)))
        means = tuple(head.get("target_means", (0., 0., 0., 0.)))
        stds = tuple(head.get("target_stds", (1., 1., 1., 1.)))
        shape_loss = BoundedIoULoss(
            beta=float(head.get("loss_shape", {}).get("beta", 0.2)),
            loss_weight=float(head.get("loss_shape", {}).get(
                "loss_weight", 1.0)), reduction="sum")
        loc_w = float(head.get("loss_loc", {}).get("loss_weight", 1.0))

        def loss_fn(params, sample, rng):
            cls_maps, reg_maps, shape_maps, loc_maps = mod.apply(
                params, sample["imgs"])
            gt_b = sample["gt_bboxes"][0]
            gt_m = sample["gt_mask"][0]
            gt_l = sample["gt_labels"][0]
            h = sample["img_shape"][0][0]
            w = sample["img_shape"][0][1]

            loc_t, loc_wt, loc_avg = ga_loc_targets(
                gt_b, gt_m, sizes, strides, octave,
                center_ratio, ignore_ratio)

            # loc focal loss per level (loss_loc_single:391-400)
            loss_loc = 0.0
            for lvl in range(len(sizes)):
                loc_logit = loc_maps[lvl][0].reshape(-1, 1).astype(jnp.float32)
                fl = sigmoid_focal_loss(
                    loc_logit, loc_t[lvl].astype(jnp.int32))
                loss_loc = loss_loc + loc_w * (
                    fl[:, 0] * loc_wt[lvl]).sum() / loc_avg

            # shape loss over the flat all-level square set (the reference
            # assigns once over the concatenation: guided_anchor_target.py
            # :165-201)
            squares = jnp.concatenate(squares_l, axis=0)
            approxs = jnp.concatenate(approxs_l, axis=0)
            allowed = float(tcfg.get("allowed_border", -1))
            if allowed < 0:      # reference GA configs: allowed_border=-1
                inside = jnp.ones((squares.shape[0],), bool)
            else:
                inside = ((squares[:, 0] >= -allowed)
                          & (squares[:, 1] >= -allowed)
                          & (squares[:, 2] < w + allowed)
                          & (squares[:, 3] < h + allowed))
            bbox_gts, pos_w, fg_num = ga_shape_target_single(
                approxs, squares, inside, gt_b, gt_m, opo,
                float(ga_a["pos_iou_thr"]), float(ga_a["neg_iou_thr"]),
                float(ga_a["min_pos_iou"]))
            shape_pred = jnp.concatenate(
                [m[0].reshape(-1, 2) for m in shape_maps], axis=0
            ).astype(jnp.float32)
            deltas2 = jnp.concatenate(
                [jnp.zeros_like(shape_pred), shape_pred], axis=1)
            pred_anchors = delta2bbox(squares, deltas2, a_means, a_stds,
                                      wh_ratio_clip=1e-6)
            loss_shape = shape_loss(
                pred_anchors, bbox_gts, weight=pos_w[:, None].repeat(4, 1)
            ) / jnp.maximum(fg_num.astype(jnp.float32), 1.0)

            # cls/bbox on the guided anchors (anchor_head.loss with focal cls)
            anchors = jax.lax.stop_gradient(pred_anchors)
            logits = jnp.concatenate(
                [c[0].reshape(-1, fg) for c in cls_maps], axis=0
            ).astype(jnp.float32)
            deltas = jnp.concatenate(
                [r[0].reshape(-1, 4) for r in reg_maps], axis=0
            ).astype(jnp.float32)
            ar = max_iou_assign(anchors, gt_b, gt_m, gt_l,
                                float(acfg["pos_iou_thr"]),
                                float(acfg["neg_iou_thr"]),
                                float(acfg["min_pos_iou"]), box_mask=inside)
            pos = ar.gt_inds > 0
            valid = ar.gt_inds >= 0
            num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
            fl = sigmoid_focal_loss(logits, ar.labels)
            loss_cls = (fl.sum(-1) * valid.astype(jnp.float32)).sum() / num_pos
            gi = jnp.maximum(ar.gt_inds - 1, 0)
            t = bbox2delta(anchors, gt_b[gi][:, :4], means, stds)
            beta = float(head.get("loss_bbox", {}).get("beta", 1.0 / 9.0))
            l1 = _smooth_l1(deltas, t, beta).sum(-1)
            loss_bbox = (l1 * pos.astype(jnp.float32)).sum() / num_pos

            total = loss_cls + loss_bbox + loss_loc + loss_shape
            return total, dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                               loss_loc=loss_loc, loss_shape=loss_shape,
                               num_pos=num_pos)

        return loss_fn
