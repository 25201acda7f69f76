"""Mixed-precision policy + dynamic loss scaling.

Counterpart of `/root/reference/mmdet/core/fp16/` (auto_fp16/force_fp32
decorators, Fp16OptimizerHook loss scaling, wrap_fp16_model/patch_norm_fp32).
On TPU the native strategy differs: **bf16 compute with f32 params** needs no
loss scaling at all (bf16 shares f32's exponent range), so the default policy
is simply a compute dtype threaded through every module (`dtype=` field) with
f32 `param_dtype`, f32 softmax/loss math, and f32 box arithmetic — the moral
equivalent of auto_fp16 + force_fp32 without decorators.

`DynamicLossScale` is provided for true-fp16 experiments and API parity with
`Fp16OptimizerHook` (hooks.py:11-85): scale the loss, unscale grads, skip the
step and halve the scale on non-finite grads, double every `growth_interval`
good steps.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Policy(NamedTuple):
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32


DEFAULT_TPU_POLICY = Policy()
FP32_POLICY = Policy(jnp.float32, jnp.float32, jnp.float32)


def cast_floating(tree, dtype):
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


class LossScaleState(NamedTuple):
    scale: jnp.ndarray
    good_steps: jnp.ndarray


class DynamicLossScale:
    """Fp16OptimizerHook-style dynamic scaling (reference hooks.py:11-85)."""

    def __init__(self, init_scale: float = 512.0, growth_factor: float = 2.0,
                 backoff_factor: float = 0.5, growth_interval: int = 2000):
        self.init_scale = init_scale
        self.growth_factor = growth_factor
        self.backoff_factor = backoff_factor
        self.growth_interval = growth_interval

    def init(self) -> LossScaleState:
        return LossScaleState(jnp.float32(self.init_scale),
                              jnp.zeros((), jnp.int32))

    def scale_loss(self, loss, state: LossScaleState):
        return loss * state.scale

    def unscale_and_check(self, grads, state: LossScaleState
                          ) -> Tuple[Any, jnp.ndarray, LossScaleState]:
        """Returns (unscaled grads, finite flag, next state)."""
        inv = 1.0 / state.scale
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        finite = jnp.all(jnp.stack([
            jnp.isfinite(g).all() for g in jax.tree_util.tree_leaves(grads)]))
        good = jnp.where(finite, state.good_steps + 1, 0)
        grow = good >= self.growth_interval
        scale = jnp.where(
            finite,
            jnp.where(grow, state.scale * self.growth_factor, state.scale),
            state.scale * self.backoff_factor)
        good = jnp.where(grow, 0, good)
        return grads, finite, LossScaleState(scale, good)

    def apply_or_skip(self, updates, finite):
        """Zero the updates when grads were non-finite (skip the step)."""
        return jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
