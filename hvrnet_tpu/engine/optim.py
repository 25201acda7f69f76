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

import re
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


_NORM_KEY = re.compile(r"(.*_)?(bn|gn)\d*$")


def paramwise_mult_trees(params, paramwise_options: dict):
    """Per-leaf (lr_mult, wd_mult) trees for `optimizer.paramwise_options`.

    Reference semantics (`mmdet/apis/train.py:86-91,133-173`):
    `norm_decay_mult` multiplies weight decay for EVERY tensor of a norm
    layer (weight and bias); `bias_lr_mult` / `bias_decay_mult` apply to
    bias tensors of non-norm layers.  Norm layers here are flax submodules
    keyed `bn*` / `gn*` (incl. `conv2_bn`-style suffixes), mirroring the
    reference's ``(bn|gn)\\d?`` name regex.  Unused by the two shipped VID
    configs — API-surface parity.
    """
    bias_lr = float(paramwise_options.get("bias_lr_mult", 1.0))
    bias_wd = float(paramwise_options.get("bias_decay_mult", 1.0))
    norm_wd = float(paramwise_options.get("norm_decay_mult", 1.0))

    def mults(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        if any(_NORM_KEY.match(k) for k in keys[:-1]):
            return 1.0, norm_wd
        if keys and keys[-1] == "bias":
            return bias_lr, bias_wd
        return 1.0, 1.0

    import jax.tree_util as jtu
    lr_tree = jtu.tree_map_with_path(lambda p, _: mults(p)[0], params)
    wd_tree = jtu.tree_map_with_path(lambda p, _: mults(p)[1], params)
    return lr_tree, wd_tree


def _add_decayed_weights_per_leaf(weight_decay: float, wd_mult_tree):
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("params required for weight decay")
        updates = jax.tree.map(
            lambda u, p, m: u + weight_decay * m * p.astype(u.dtype),
            updates, params, wd_mult_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_per_leaf(mult_tree):
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda u, m: u * m, updates, mult_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(schedule: Callable, momentum: float = 0.9,
                   weight_decay: float = 1e-4, clip_norm: float = 35.0,
                   trainable_mask=None, paramwise_options: Optional[dict] = None,
                   params=None) -> optax.GradientTransformation:
    """torch-SGD chain: clip → +wd·param → momentum buffer → −lr·buf.

    ``paramwise_options`` (requires ``params`` for tree structure) reproduces
    the reference's per-group lr/decay multipliers: the lr mult scales the
    FINAL update (torch applies per-group lr after the momentum buffer), the
    decay mults scale the decoupled-into-grad weight decay term.
    """
    if paramwise_options:
        if params is None:
            raise ValueError("paramwise_options needs `params` to build "
                             "per-leaf multiplier trees")
        lr_tree, wd_tree = paramwise_mult_trees(params, paramwise_options)
        decay = _add_decayed_weights_per_leaf(weight_decay, wd_tree)
        lr_scale = (_scale_per_leaf(lr_tree),)
    else:
        decay = optax.add_decayed_weights(weight_decay)
        lr_scale = ()
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        decay,
        optax.trace(decay=momentum, nesterov=False),
        *lr_scale,
        optax.scale_by_learning_rate(schedule),
    )
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx
