"""RPN head + static proposal generation.

Network mirrors `/root/reference/mmdet/models/anchor_heads/rpn_head.py:18-35`
(3×3 conv → ReLU → 1×1 sigmoid cls + 1×1 reg, std-0.01 normal init).
Proposal generation (`rpn_head.py:55-104`) is re-expressed as fixed-shape XLA:
top-`nms_pre` by score → delta2bbox(clamped to img_shape) → min-size mask →
static greedy NMS emitting exactly `nms_post` slots + a validity mask.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.boxes import delta2bbox
from ...ops.nms import nms_static
from ..layers import Conv, normal_init
from ..registry import HEADS


@HEADS.register_module
class RPNHead(nn.Module):
    in_channels: int = 1024
    feat_channels: int = 512
    anchor_scales: Tuple[float, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (16,)
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)

    @nn.compact
    def __call__(self, x):
        """x: (B, Hf, Wf, C) → cls (B, Hf, Wf, A), reg (B, Hf, Wf, A*4)."""
        init = normal_init(0.01)
        h = Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                 kernel_init=init, name="rpn_conv")(x)
        h = nn.relu(h)
        cls = Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                   kernel_init=init, name="rpn_cls")(h)
        reg = Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                   kernel_init=init, name="rpn_reg")(h)
        return cls, reg


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # (P, 4)
    scores: jnp.ndarray  # (P,)
    mask: jnp.ndarray    # (P,) bool


def rpn_flat_scores_deltas(cls: jnp.ndarray, reg: jnp.ndarray):
    """Flatten per-image RPN maps to anchor-ordered vectors.

    The reference permutes NCHW → (H, W, A[*4]) then reshapes
    (rpn_head.py:69-76); in NHWC the channel axis is already last, so the
    anchor-major flattening order matches: index = ((y*W)+x)*A + a.
    """
    scores = jax.nn.sigmoid(cls.reshape(-1).astype(jnp.float32))
    deltas = reg.reshape(-1, 4).astype(jnp.float32)
    return scores, deltas


def rpn_proposals_single(cls: jnp.ndarray, reg: jnp.ndarray,
                         anchors: jnp.ndarray, img_shape: jnp.ndarray,
                         cfg, target_means=(0., 0., 0., 0.),
                         target_stds=(1., 1., 1., 1.)) -> Proposals:
    """Static-shape version of `rpn_head.py:get_bboxes_single` (single level).

    Args:
        cls: (Hf, Wf, A) logits; reg: (Hf, Wf, A*4) deltas.
        anchors: (Hf*Wf*A, 4) precomputed grid anchors (host constant).
        img_shape: (2,) [h, w] for box clamping (dynamic values).
        cfg: dict-like with nms_pre / nms_post / max_num / nms_thr / min_bbox_size.
    """
    scores, deltas = rpn_flat_scores_deltas(cls, reg)
    nms_pre = int(cfg["nms_pre"])
    if scores.shape[0] > nms_pre:
        scores, topk = jax.lax.top_k(scores, nms_pre)
        deltas = deltas[topk]
        anchors = anchors[topk]
    proposals = delta2bbox(anchors, deltas, target_means, target_stds,
                           max_shape=img_shape)
    valid = jnp.ones_like(scores, dtype=bool)
    min_size = float(cfg.get("min_bbox_size", 0))
    if min_size > 0:
        w = proposals[:, 2] - proposals[:, 0] + 1
        h = proposals[:, 3] - proposals[:, 1] + 1
        valid = (w >= min_size) & (h >= min_size)
    nms_post = int(cfg["nms_post"])
    keep_idx, keep_mask = nms_static(proposals, scores, float(cfg["nms_thr"]),
                                     nms_post, valid=valid)
    boxes = proposals[keep_idx] * keep_mask[:, None]
    out_scores = jnp.where(keep_mask, scores[keep_idx], 0.0)
    return Proposals(boxes=boxes, scores=out_scores, mask=keep_mask)
