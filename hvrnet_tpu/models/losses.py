"""Loss functions — pure jnp, weighted-reduction semantics of the reference.

Reference: `/root/reference/mmdet/models/losses/` (cross_entropy_loss.py,
smooth_l1_loss.py, focal_loss.py, iou_loss.py, balanced_l1_loss.py,
ghm_loss.py, mse_loss.py, utils.py, accuracy.py).  The fused CUDA
sigmoid-focal-loss kernel (`ops/sigmoid_focal_loss/src`) is a plain jnp
expression here — XLA fuses it.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .registry import LOSSES


def weight_reduce_loss(loss, weight=None, reduction: str = "mean",
                       avg_factor=None):
    """reference losses/utils.py:26-52."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss
    if reduction == "mean":
        return loss.sum() / avg_factor
    if reduction == "none":
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def softmax_cross_entropy(pred, label):
    """Elementwise CE with integer labels (F.cross_entropy reduction='none')."""
    logz = jax.nn.logsumexp(pred, axis=-1)
    gold = jnp.take_along_axis(pred, label[..., None], axis=-1)[..., 0]
    return logz - gold


def binary_cross_entropy_with_logits(pred, target):
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def expand_binary_labels(labels, label_weights, label_channels):
    """reference cross_entropy_loss.py:23-33: 1-based fg labels → one-hot."""
    bin_labels = (jax.nn.one_hot(labels - 1, label_channels)
                  * (labels >= 1)[..., None].astype(jnp.float32))
    if label_weights is None:
        bin_weights = None
    else:
        bin_weights = jnp.broadcast_to(label_weights[..., None],
                                       labels.shape + (label_channels,))
    return bin_labels, bin_weights


@LOSSES.register_module
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean",
                 loss_weight=1.0):
        assert not use_mask, "mask CE not needed by the HVRNet stack"
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if self.use_sigmoid:
            if cls_score.ndim != label.ndim:
                label, weight = expand_binary_labels(label, weight, cls_score.shape[-1])
            loss = binary_cross_entropy_with_logits(cls_score, label.astype(jnp.float32))
            # mmdet applies weight inside BCE then reduces; equivalent here
        else:
            loss = softmax_cross_entropy(cls_score, label)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        diff = jnp.abs(pred - target)
        loss = jnp.where(diff < self.beta,
                         0.5 * diff * diff / self.beta,
                         diff - 0.5 * self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module
class MSELoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = (pred - target) ** 2
        return self.loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)


def sigmoid_focal_loss(pred, target, gamma=2.0, alpha=0.25):
    """reference ops/sigmoid_focal_loss CUDA kernel as jnp (XLA fuses it).

    target: integer labels, 1-based foreground, 0 = background.
    """
    num_classes = pred.shape[-1]
    t = jax.nn.one_hot(target - 1, num_classes) * (target >= 1)[..., None]
    p = jax.nn.sigmoid(pred)
    pt = jnp.where(t == 1, p, 1 - p)
    at = jnp.where(t == 1, alpha, 1 - alpha)
    ce = binary_cross_entropy_with_logits(pred, t)
    return at * (1 - pt) ** gamma * ce


@LOSSES.register_module
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction="mean", loss_weight=1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = sigmoid_focal_loss(pred, target, self.gamma, self.alpha)
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module
class IoULoss:
    """-log(IoU) loss (reference iou_loss.py:73)."""

    def __init__(self, eps=1e-6, reduction="mean", loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        from ..ops.boxes import bbox_overlaps  # aligned IoU below
        reduction = reduction_override or self.reduction
        lt = jnp.maximum(pred[:, :2], target[:, :2])
        rb = jnp.minimum(pred[:, 2:4], target[:, 2:4])
        wh = jnp.clip(rb - lt + 1, 0, None)
        overlap = wh[:, 0] * wh[:, 1]
        a1 = (pred[:, 2] - pred[:, 0] + 1) * (pred[:, 3] - pred[:, 1] + 1)
        a2 = (target[:, 2] - target[:, 0] + 1) * (target[:, 3] - target[:, 1] + 1)
        ious = overlap / jnp.maximum(a1 + a2 - overlap, self.eps)
        loss = -jnp.log(jnp.clip(ious, self.eps, None))
        if weight is not None and weight.ndim > 1:
            weight = weight[:, 0]
        return self.loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module
class BoundedIoULoss:
    """Bounded IoU loss (reference iou_loss.py:105): per-coordinate bounded
    IoU surrogate on (dx, dy, dw, dh)-style targets."""

    def __init__(self, beta=0.2, eps=1e-3, reduction="mean", loss_weight=1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        px = (pred[:, 0] + pred[:, 2]) * 0.5
        py = (pred[:, 1] + pred[:, 3]) * 0.5
        pw = pred[:, 2] - pred[:, 0] + 1
        ph = pred[:, 3] - pred[:, 1] + 1
        tx = (target[:, 0] + target[:, 2]) * 0.5
        ty = (target[:, 1] + target[:, 3]) * 0.5
        tw = target[:, 2] - target[:, 0] + 1
        th = target[:, 3] - target[:, 1] + 1
        dx = tx - px
        dy = ty - py
        loss_dx = 1 - jnp.maximum((tw - 2 * jnp.abs(dx)) /
                                  (tw + 2 * jnp.abs(dx) + self.eps), 0)
        loss_dy = 1 - jnp.maximum((th - 2 * jnp.abs(dy)) /
                                  (th + 2 * jnp.abs(dy) + self.eps), 0)
        loss_dw = 1 - jnp.minimum(tw / (pw + self.eps), pw / (tw + self.eps))
        loss_dh = 1 - jnp.minimum(th / (ph + self.eps), ph / (th + self.eps))
        comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
        loss = jnp.where(comb < self.beta,
                         0.5 * comb * comb / self.beta,
                         comb - 0.5 * self.beta)
        if weight is not None and weight.ndim > loss.ndim:
            weight = weight[..., 0]
        return self.loss_weight * weight_reduce_loss(
            loss.sum(axis=-1), weight if weight is None or weight.ndim == 1
            else weight[:, 0], reduction, avg_factor)


@LOSSES.register_module
class BalancedL1Loss:
    """reference balanced_l1_loss.py:30 (Libra R-CNN)."""

    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction="mean",
                 loss_weight=1.0):
        self.alpha, self.gamma, self.beta = alpha, gamma, beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        diff = jnp.abs(pred - target)
        b = jnp.e ** (self.gamma / self.alpha) - 1
        loss = jnp.where(
            diff < self.beta,
            self.alpha / b * (b * diff + 1) * jnp.log(b * diff / self.beta + 1)
            - self.alpha * diff,
            self.gamma * diff + self.gamma / b - self.alpha * self.beta)
        return self.loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module
class GHMC:
    """Gradient-harmonized classification loss (reference ghm_loss.py:20)."""

    def __init__(self, bins=10, momentum=0, use_sigmoid=True, loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight, avg_factor=None,
                 reduction_override=None):
        if pred.ndim != target.ndim:
            target, label_weight = expand_binary_labels(target, label_weight,
                                                        pred.shape[-1])
        target = target.astype(jnp.float32)
        g = jnp.abs(jax.nn.sigmoid(pred) - target)
        valid = label_weight > 0
        tot = jnp.maximum(valid.sum(), 1.0)
        edges = jnp.linspace(0, 1, self.bins + 1).at[-1].add(1e-6)
        weights = jnp.zeros_like(pred)
        for i in range(self.bins):
            inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
            num_in_bin = inds.sum()
            weights = jnp.where(inds & (num_in_bin > 0),
                                tot / jnp.maximum(num_in_bin, 1), weights)
        weights = weights / self.bins
        loss = binary_cross_entropy_with_logits(pred, target) * weights
        return self.loss_weight * loss.sum() / tot


@LOSSES.register_module
class GHMR:
    """Gradient-harmonized regression loss (reference ghm_loss.py:98)."""

    def __init__(self, mu=0.02, bins=10, momentum=0, loss_weight=1.0):
        self.mu = mu
        self.bins = bins
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight, avg_factor=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
        valid = label_weight > 0
        tot = jnp.maximum(valid.sum(), 1.0)
        edges = jnp.linspace(0, 1, self.bins + 1).at[-1].add(1e3)
        weights = jnp.zeros_like(g)
        for i in range(self.bins):
            inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
            num_in_bin = inds.sum()
            weights = jnp.where(inds & (num_in_bin > 0),
                                tot / jnp.maximum(num_in_bin, 1), weights)
        weights = weights / self.bins
        return self.loss_weight * (loss * weights).sum() / tot


def accuracy(pred, target, mask=None):
    """Top-1 accuracy ×100 (reference accuracy.py:4-21), optionally masked."""
    correct = (jnp.argmax(pred, axis=-1) == target).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return 100.0 * (correct * m).sum() / jnp.maximum(m.sum(), 1.0)
    return 100.0 * correct.mean()


def build_loss(cfg):
    from ..utils.registry import build_from_cfg
    return build_from_cfg(cfg, LOSSES)
