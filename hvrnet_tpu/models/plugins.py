"""Backbone plugins (reference `mmdet/models/plugins/` + `mmdet/ops/gcb`):
NonLocal2D (non_local.py), ContextBlock/GCB (ops/gcb/context_block.py),
GeneralizedAttention (generalized_attention.py).  Zoo-parity modules; both
shipped configs run with gcb/gen_attention disabled.
"""
from __future__ import annotations

import math
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


def _sine_position_embedding(length_q, length_kv, q_stride, kv_stride,
                             magnitude, feat_dim, wave_length=1000.0):
    """Relative-coordinate sinusoid table (reference get_position_embedding,
    generalized_attention.py:152-194).  Returns (length_q, length_kv,
    feat_dim/2): [sin(diff/λ_i) ‖ cos(diff/λ_i)]."""
    import numpy as np
    q_idx = np.arange(length_q, dtype=np.float32) * q_stride
    kv_idx = np.arange(length_kv, dtype=np.float32) * kv_stride
    diff = (q_idx[:, None] - kv_idx[None, :]) * magnitude      # (q, kv)
    feat_range = np.arange(int(feat_dim / 4), dtype=np.float32)
    dim_mat = wave_length ** ((4.0 / feat_dim) * feat_range)   # (feat_dim/4,)
    phase = diff[:, :, None] / dim_mat[None, None, :]
    emb = np.concatenate([np.sin(phase), np.cos(phase)], axis=2)
    return jnp.asarray(emb)


def _local_constraint_mask(h, w, h_kv, w_kv, spatial_range, kv_stride):
    """Boolean (h*w, h_kv*w_kv) mask, True where attention is FORBIDDEN
    (reference local_constraint_map build, generalized_attention.py:111-136:
    the allowed kv window per query position is
    [(i - range)//kv .. (i + range + 1)//kv] inclusive, clamped)."""
    import numpy as np
    iy = np.arange(h)[:, None]
    ky = np.arange(h_kv)[None, :]
    y_ok = (ky >= np.maximum((iy - spatial_range) // kv_stride, 0)) & \
           (ky <= (iy + spatial_range + 1) // kv_stride)
    ix = np.arange(w)[:, None]
    kx = np.arange(w_kv)[None, :]
    x_ok = (kx >= np.maximum((ix - spatial_range) // kv_stride, 0)) & \
           (kx <= (ix + spatial_range + 1) // kv_stride)
    allowed = y_ok[:, None, :, None] & x_ok[None, :, None, :]
    return jnp.asarray(~allowed.reshape(h * w, h_kv * w_kv))


class GeneralizedAttention(nn.Module):
    """Generalized empirical attention — full four-term re-implementation of
    reference `mmdet/models/plugins/generalized_attention.py:10-383`.

    attention_type is a binary indicator string over the four energy items
    (reference docstring, generalized_attention.py:25-31):
      [0] '1000' query-content × key-content        (appr ⊙ appr)
      [1] '0100' query-content × relative-position  (appr ⊙ position)
      [2] '0010' key-content only                   (bias ⊙ appr)
      [3] '0001' relative-position only             (bias ⊙ position)
    Energies are raw dot products (the reference applies no 1/√d scaling);
    position terms use sinusoid embeddings of the (query−key) coordinate
    difference projected per-axis by appr_geom_fc_{x,y} and divided by √2
    (generalized_attention.py:226-238); the output is gamma-gated and added
    to the input (generalized_attention.py:370-372).

    TPU-first notes: the position tables and the spatial-range constraint
    mask are trace-time constants (static H/W), so XLA folds them; the 6-D
    energy composition is expressed as einsums that lower to MXU matmuls.
    """
    in_channels: int
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: int = 1
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = "1111"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        at = [c == "1" for c in self.attention_type]
        heads = self.num_heads
        qk_dim = self.in_channels // heads       # per-head dim (ref:57)
        out_c = qk_dim * heads
        v_dim = self.in_channels // heads        # per-head value dim (ref:76)
        pos_dim = (self.position_embedding_dim
                   if self.position_embedding_dim > 0 else self.in_channels)
        kaiming_u = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        stdv = 1.0 / math.sqrt(qk_dim * 2)
        bias_u = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -stdv, stdv)

        x_q = x[:, ::self.q_stride, ::self.q_stride, :]
        x_kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        B, H, W, _ = x_q.shape
        Hk, Wk = x_kv.shape[1:3]

        if at[0] or at[1]:
            q = Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                     kernel_init=kaiming_u, name="query_conv")(x_q)
            q = q.reshape(B, H * W, heads, qk_dim)
        if at[0] or at[2]:
            k = Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                     kernel_init=kaiming_u, name="key_conv")(x_kv)
            k = k.reshape(B, Hk * Wk, heads, qk_dim)
        v = Conv(v_dim * heads, (1, 1), use_bias=False, dtype=self.dtype,
                 kernel_init=kaiming_u, name="value_conv")(x_kv)
        v = v.reshape(B, Hk * Wk, heads, v_dim)

        if at[1] or at[3]:
            emb_x = _sine_position_embedding(W, Wk, self.q_stride,
                                             self.kv_stride,
                                             self.position_magnitude, pos_dim)
            emb_y = _sine_position_embedding(H, Hk, self.q_stride,
                                             self.kv_stride,
                                             self.position_magnitude, pos_dim)
            fc_x = nn.Dense(out_c, use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=kaiming_u,
                            name="appr_geom_fc_x")
            fc_y = nn.Dense(out_c, use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=kaiming_u,
                            name="appr_geom_fc_y")
            # (w, w_kv, heads, qk_dim) / √2  (ref:226-238)
            pos_x = fc_x(emb_x).reshape(W, Wk, heads, qk_dim) / math.sqrt(2)
            pos_y = fc_y(emb_y).reshape(H, Hk, heads, qk_dim) / math.sqrt(2)
        if at[2]:
            appr_bias = self.param("appr_bias", bias_u, (out_c,))
            appr_bias = appr_bias.reshape(heads, qk_dim).astype(self.dtype)
        if at[3]:
            geom_bias = self.param("geom_bias", bias_u, (out_c,))
            geom_bias = geom_bias.reshape(heads, qk_dim).astype(self.dtype)

        f32 = jnp.float32
        if sum(at) == 1 and at[2]:
            # saliency-only fast path: one energy row per head broadcast over
            # all query positions; output is a 1×1 map added to every pixel
            # (ref:241-249).
            energy = jnp.einsum("hd,bkhd->bhk", appr_bias, k,
                                preferred_element_type=f32)
            energy = energy[:, :, None, :]                  # (B, heads, 1, K)
            if self.spatial_range >= 0:
                # the reference applies the constraint map after the fast
                # path sets h=w=1 (generalized_attention.py:349-356): the
                # allowed kv window is query position (0,0)'s
                forbid = _local_constraint_mask(1, 1, Hk, Wk,
                                                self.spatial_range,
                                                self.kv_stride)
                energy = jnp.where(forbid[None, None], -jnp.inf, energy)
            Hq, Wq = 1, 1
        else:
            Hq, Wq = H, W
            energy = jnp.zeros((B, heads, H, W, Hk, Wk), f32)
            if at[0] and at[2]:
                energy += jnp.einsum("bqhd,bkhd->bhqk", q + appr_bias, k,
                                     preferred_element_type=f32
                                     ).reshape(B, heads, H, W, Hk, Wk)
            elif at[0]:
                energy += jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                     preferred_element_type=f32
                                     ).reshape(B, heads, H, W, Hk, Wk)
            elif at[2]:
                e = jnp.einsum("hd,bkhd->bhk", appr_bias, k,
                               preferred_element_type=f32)
                energy += e.reshape(B, heads, 1, 1, Hk, Wk)
            if at[1] and at[3]:
                qg = (q + geom_bias).reshape(B, H, W, heads, qk_dim)
                energy += jnp.einsum("byxhd,xkhd->bhyxk", qg, pos_x,
                                     preferred_element_type=f32)[..., None, :]
                energy += jnp.einsum("byxhd,ykhd->bhyxk", qg, pos_y,
                                     preferred_element_type=f32)[..., None]
            elif at[1]:
                qr = q.reshape(B, H, W, heads, qk_dim)
                energy += jnp.einsum("byxhd,xkhd->bhyxk", qr, pos_x,
                                     preferred_element_type=f32)[..., None, :]
                energy += jnp.einsum("byxhd,ykhd->bhyxk", qr, pos_y,
                                     preferred_element_type=f32)[..., None]
            elif at[3]:
                ex = jnp.einsum("xkhd,hd->hxk", pos_x, geom_bias,
                                preferred_element_type=f32)
                ey = jnp.einsum("ykhd,hd->hyk", pos_y, geom_bias,
                                preferred_element_type=f32)
                energy += ex[None, :, None, :, None, :]
                energy += ey[None, :, :, None, :, None]
            energy = energy.reshape(B, heads, H * W, Hk * Wk)
            if self.spatial_range >= 0:
                forbid = _local_constraint_mask(H, W, Hk, Wk,
                                                self.spatial_range,
                                                self.kv_stride)
                energy = jnp.where(forbid[None, None], -jnp.inf, energy)

        attn = jax.nn.softmax(energy, axis=3)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                         preferred_element_type=f32)
        # head-major channel layout matches the torch permute/view (ref:365-368)
        out = out.reshape(B, Hq, Wq, heads * v_dim).astype(x.dtype)
        out = Conv(self.in_channels, (1, 1), dtype=self.dtype,
                   kernel_init=kaiming_u, name="proj_conv")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma.astype(x.dtype) * out + x
