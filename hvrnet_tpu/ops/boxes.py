"""Box geometry ops — pure jnp, shape-static, XLA-fusable.

Numerics follow the reference's +1-pixel box conventions:
  * encode/decode: `/root/reference/mmdet/core/bbox/transforms.py:6-111`
  * IoU:           `/root/reference/mmdet/core/bbox/geometry.py` (+1 wh)
All functions take fixed-shape arrays; invalid rows are handled by the callers
with masks rather than dynamic filtering.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.)) -> jnp.ndarray:
    """Encode gt boxes relative to proposals (reference transforms.py:6-31)."""
    proposals = proposals.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    return (deltas - means) / stds


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               max_shape: Optional[jnp.ndarray] = None,
               wh_ratio_clip: float = 16. / 1000.) -> jnp.ndarray:
    """Decode deltas on top of rois (reference transforms.py:34-111).

    rois: (N, 4); deltas: (N, 4k).  max_shape: optional (h, w) array (dynamic
    values, static shape) used for clamping.
    """
    rois = rois.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    k = deltas.shape[-1] // 4
    means = jnp.tile(jnp.asarray(means, jnp.float32), k)
    stds = jnp.tile(jnp.asarray(stds, jnp.float32), k)
    denorm = deltas * stds + means
    dx = denorm[..., 0::4]
    dy = denorm[..., 1::4]
    dw = denorm[..., 2::4]
    dh = denorm[..., 3::4]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    if max_shape is not None:
        h = max_shape[0].astype(jnp.float32)
        w = max_shape[1].astype(jnp.float32)
        x1 = jnp.clip(x1, 0., w - 1.)
        y1 = jnp.clip(y1, 0., h - 1.)
        x2 = jnp.clip(x2, 0., w - 1.)
        y2 = jnp.clip(y2, 0., h - 1.)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(deltas.shape)


def bbox_flip(bboxes: jnp.ndarray, img_shape) -> jnp.ndarray:
    """Horizontal flip in +1 convention (reference transforms.py:114-131)."""
    w = img_shape[1]
    flipped = bboxes.at[..., 0::4].set(w - bboxes[..., 2::4] - 1)
    flipped = flipped.at[..., 2::4].set(w - bboxes[..., 0::4] - 1)
    return flipped


def bbox_mapping(bboxes, img_shape, scale_factor, flip):
    new = bboxes * scale_factor
    if flip:
        new = bbox_flip(new, img_shape)
    return new


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip):
    new = bbox_flip(bboxes, img_shape) if flip else bboxes
    return new / scale_factor


def bbox_overlaps(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                  mode: str = "iou") -> jnp.ndarray:
    """Pairwise IoU/IoF with the +1 wh convention (reference geometry.py).

    bboxes1: (M, 4), bboxes2: (N, 4) → (M, N).
    """
    assert mode in ("iou", "iof")
    b1 = bboxes1.astype(jnp.float32)
    b2 = bboxes2.astype(jnp.float32)
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:4], b2[None, :, 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]
    area1 = (b1[:, 2] - b1[:, 0] + 1.0) * (b1[:, 3] - b1[:, 1] + 1.0)
    if mode == "iou":
        area2 = (b2[:, 2] - b2[:, 0] + 1.0) * (b2[:, 3] - b2[:, 1] + 1.0)
        union = area1[:, None] + area2[None, :] - overlap
    else:
        union = area1[:, None]
    return overlap / jnp.maximum(union, 1e-10)


def bbox2result_np(bboxes: np.ndarray, labels: np.ndarray, num_classes: int):
    """Split (n,5) dets into per-class numpy lists (transforms.py:181-199).

    Host-side helper used when assembling final results; ``bboxes`` may carry
    padding rows — callers must pre-filter with the validity mask.
    """
    if bboxes.shape[0] == 0:
        return [np.zeros((0, 5), dtype=np.float32) for _ in range(num_classes - 1)]
    return [bboxes[labels == i, :] for i in range(num_classes - 1)]
