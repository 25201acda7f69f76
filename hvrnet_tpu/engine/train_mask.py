"""Mask-branch and SSD training objectives (zoo completion).

* `mask_branch_loss` — Mask R-CNN's mask training path (reference
  `mmdet/models/mask_heads/fcn_mask_head.py:loss` + `mask_target.py`):
  14×14 RoIAlign on positive RoIs → FCN head → per-class BCE against GT
  masks cropped to the 28×28 grid.
* `ssd_targets_and_loss` — SSDHead's objective (reference
  `anchor_heads/ssd_head.py:loss`): MaxIoU assignment (pos .5 / neg .5 /
  min_pos .2 per the SSD config), softmax CE with 3:1 hard-negative mining,
  SmoothL1 regression on positives.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.targets import max_iou_assign
from ..models.losses import softmax_cross_entropy
from ..models.mask_heads import mask_target
from ..ops.boxes import bbox2delta
from .train import _smooth_l1


def mask_branch_loss(mask_pred: jnp.ndarray, gt_masks_per_roi: jnp.ndarray,
                     rois: jnp.ndarray, labels: jnp.ndarray,
                     pos_mask: jnp.ndarray, mask_size: int = 28,
                     class_agnostic: bool = False) -> jnp.ndarray:
    """BCE over positive RoIs' predicted masks at their GT class channel.

    Args:
        mask_pred: (R, 28, 28, C) logits from FCNMaskHead.
        gt_masks_per_roi: (R, H, W) full-image binary masks of each RoI's
            assigned GT (gathered by the sampler).
        rois: (R, 5) sampled boxes (batch col unused — targets crop by row).
        labels: (R,) 1-based class labels.
        pos_mask: (R,) positives-only weighting.
    """
    targets = mask_target(gt_masks_per_roi, rois, mask_size)   # (R, 28, 28)
    if class_agnostic:
        pred = mask_pred[..., 0]
    else:
        idx = jnp.maximum(labels - 1, 0)
        pred = jnp.take_along_axis(
            mask_pred, idx[:, None, None, None], axis=-1)[..., 0]
    bce = jnp.maximum(pred, 0) - pred * targets + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    per_roi = bce.mean(axis=(1, 2))
    w = pos_mask.astype(jnp.float32)
    return (per_roi * w).sum() / jnp.maximum(w.sum(), 1.0)


def ssd_targets_and_loss(logits: jnp.ndarray, deltas: jnp.ndarray,
                         anchors: jnp.ndarray, gt_bboxes: jnp.ndarray,
                         gt_mask: jnp.ndarray, gt_labels: jnp.ndarray,
                         neg_pos_ratio: int = 3,
                         target_means=(0., 0., 0., 0.),
                         target_stds=(0.1, 0.1, 0.2, 0.2),
                         smoothl1_beta: float = 1.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SSD loss over one image's flat anchor set.

    logits: (A, C) softmax class scores (col 0 = background);
    deltas: (A, 4); anchors: (A, 4).
    """
    ar = max_iou_assign(anchors, gt_bboxes, gt_mask, gt_labels,
                        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.2)
    pos = ar.gt_inds > 0
    neg = ar.gt_inds == 0
    n_pos = jnp.maximum(pos.sum(), 1)

    ce = softmax_cross_entropy(logits, ar.labels)
    # hard negative mining: top (3 × #pos) negatives by CE (ssd_head.py:loss)
    neg_ce = jnp.where(neg, ce, -jnp.inf)
    order = jnp.argsort(-neg_ce)
    rank = jnp.argsort(order)
    hard_neg = neg & (rank < neg_pos_ratio * n_pos)
    w = (pos | hard_neg).astype(jnp.float32)
    loss_cls = (ce * w).sum() / n_pos.astype(jnp.float32)

    gi = jnp.maximum(ar.gt_inds - 1, 0)
    t = bbox2delta(anchors, gt_bboxes[gi][:, :4], target_means, target_stds)
    l1 = _smooth_l1(deltas, t, smoothl1_beta).sum(-1)
    loss_bbox = (l1 * pos.astype(jnp.float32)).sum() / n_pos.astype(jnp.float32)
    return loss_cls, loss_bbox
