"""Optimizer + LR schedule matching the reference training recipe.

Reference: SGD(momentum .9, weight_decay 1e-4) with L2 grad-clip 35 applied
to raw (allreduced) grads each iter (`configs/*:optimizer`,
`core/utils/dist_utils.py:44-56`) and mmcv's step LR policy with linear
warmup (`lr_config`, warmup 500 iters @ ratio 1/3).

torch-SGD semantics reproduced exactly: clip → +wd·param → momentum buffer →
−lr·buf.  Parameters that torch never updates (requires_grad=False BN and
frozen stages; parameters with no loss dependence, e.g. backbone/RPN in
HVRNet training, hnmb_rcnn.py:59-72,321-335) are masked out so weight decay
cannot touch them.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def step_lr_schedule(base_lr: float, steps_per_epoch: int,
                     milestones_epochs: Sequence[int], gamma: float = 0.1,
                     warmup_iters: int = 500,
                     warmup_ratio: float = 1.0 / 3) -> Callable:
    """mmcv StepLrUpdater + linear warmup."""
    milestones = [m * steps_per_epoch for m in milestones_epochs]

    def schedule(step):
        step = jnp.asarray(step)
        decays = jnp.sum(jnp.asarray([step >= m for m in milestones]).astype(jnp.int32)) \
            if milestones else 0
        lr = base_lr * (gamma ** decays)
        if warmup_iters > 0:
            k = (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
            warm = lr * (1.0 - k)
            lr = jnp.where(step < warmup_iters, warm, lr)
        return lr

    return schedule


def default_trainable_mask(params, frozen_stages: int = 1,
                           freeze_backbone: bool = False,
                           freeze_rpn: bool = False):
    """True = parameter receives updates.

    Frozen: every FrozenBN tensor (norm_cfg requires_grad=False in both
    configs), the stem + stages ≤ frozen_stages of the backbone, and
    optionally the whole backbone / RPN head (HVRNet trains them under
    no_grad, so torch leaves them untouched — no decay either).
    """
    def trainable(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        if any(k == "bn" for k in keys):
            return False
        if "backbone" in keys:
            if freeze_backbone or "stem" in keys:
                return False
            for s in range(1, frozen_stages + 1):
                if f"layer{s}" in keys:
                    return False
        if freeze_rpn and "rpn_head" in keys:
            return False
        return True

    import jax.tree_util as jtu
    return jtu.tree_map_with_path(lambda path, _: trainable(path), params)


def make_optimizer(schedule: Callable, momentum: float = 0.9,
                   weight_decay: float = 1e-4, clip_norm: float = 35.0,
                   trainable_mask=None) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx
