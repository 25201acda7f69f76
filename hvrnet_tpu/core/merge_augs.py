"""Augmented-test merging (reference `mmdet/core/post_processing/merge_augs.py`
:8-104) — flip/scale-aware merging of proposals, bboxes, scores and masks,
fixed-shape with validity masks.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_mapping_back
from ..ops.nms import nms_static


def merge_aug_proposals(aug_proposals: Sequence[jnp.ndarray],
                        img_metas: Sequence[dict], rpn_test_cfg,
                        valid_masks: Optional[Sequence[jnp.ndarray]] = None):
    """Map per-aug proposals back to original coords, NMS, keep max_num.

    aug_proposals: list of (P, 5) [x1,y1,x2,y2,score] per augmentation.
    """
    recovered = []
    masks = []
    for i, (proposals, meta) in enumerate(zip(aug_proposals, img_metas)):
        boxes = bbox_mapping_back(proposals[:, :4], meta["img_shape"],
                                  meta["scale_factor"], meta["flip"])
        recovered.append(jnp.concatenate([boxes, proposals[:, 4:5]], axis=1))
        masks.append(valid_masks[i] if valid_masks is not None
                     else jnp.ones(proposals.shape[0], bool))
    allp = jnp.concatenate(recovered, axis=0)
    vmask = jnp.concatenate(masks, axis=0)
    max_num = int(rpn_test_cfg["max_num"])
    idx, keep = nms_static(allp[:, :4], allp[:, 4],
                           float(rpn_test_cfg["nms_thr"]), max_num,
                           valid=vmask)
    out = allp[idx] * keep[:, None]
    return out, keep


def merge_aug_bboxes(aug_bboxes: Sequence[jnp.ndarray],
                     aug_scores: Optional[Sequence[jnp.ndarray]],
                     img_metas: Sequence[dict], rcnn_test_cfg=None):
    """Average aug detections after mapping back (merge_augs.py:40-66)."""
    recovered = []
    for bboxes, meta in zip(aug_bboxes, img_metas):
        recovered.append(bbox_mapping_back(
            bboxes.reshape(-1, 4), meta["img_shape"], meta["scale_factor"],
            meta["flip"]).reshape(bboxes.shape))
    bboxes = sum(recovered) / len(recovered)
    if aug_scores is None:
        return bboxes, None
    scores = sum(aug_scores) / len(aug_scores)
    return bboxes, scores


def merge_aug_scores(aug_scores: Sequence[jnp.ndarray]):
    return sum(aug_scores) / len(aug_scores)


def merge_aug_masks(aug_masks: Sequence[np.ndarray],
                    img_metas: Sequence[dict], rcnn_test_cfg=None,
                    weights: Optional[Sequence[float]] = None):
    """Host-side averaging of mask probabilities, unflipping as needed."""
    recovered = []
    for mask, meta in zip(aug_masks, img_metas):
        m = np.asarray(mask)
        if meta.get("flip", False):
            m = m[:, :, ::-1] if m.ndim == 3 else m[:, :, ::-1, :]
        recovered.append(m)
    if weights is None:
        return np.mean(recovered, axis=0)
    w = np.asarray(weights, np.float32)
    return np.average(np.stack(recovered), axis=0, weights=w)
