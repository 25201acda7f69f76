"""Deformable convolution / pooling and masked convolution — XLA gather form.

TPU-native equivalents of the reference CUDA ops (SURVEY §2.3; both shipped
configs set ``dcn=None`` so these are zoo-parity ops):
  * `DeformConv` v1 im2col kernels
    (`/root/reference/mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu`, 866 LoC):
    per-position learned offsets deform the 3×3 sampling grid with bilinear
    taps — here a batched gather + einsum contraction (MXU-friendly).
  * `ModulatedDeformConv` v2: adds a sigmoid per-tap modulation mask.
  * `DeformRoIPooling` (`deform_pool_cuda*.cu`): RoIAlign-style pooling with
    learned per-bin offsets scaled by gamma·roi_size.
  * `MaskedConv2d` (`ops/masked_conv/src`): the CUDA kernel computes the conv
    only at masked positions as a speed trick; numerically it equals
    conv(x) masked at the output, which is what XLA fusion gives for free.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """img: (H, W, C); ys/xs: (...,) float coords → (..., C) with zero pad.

    Edge rules follow the deform-conv kernel: zero outside [-1, dim], clamp
    into range for the 4 taps.
    """
    H, W, C = img.shape
    inside = (ys > -1.0) & (ys < H) & (xs > -1.0) & (xs < W)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    flat = img.reshape(H * W, C)

    def tap(yi, xi):
        return flat[(yi * W + xi).reshape(-1)].reshape(ys.shape + (C,))

    w00 = ((1 - ly) * (1 - lx))[..., None]
    w01 = ((1 - ly) * lx)[..., None]
    w10 = (ly * (1 - lx))[..., None]
    w11 = (ly * lx)[..., None]
    out = (w00 * tap(y0i, x0i) + w01 * tap(y0i, x1i)
           + w10 * tap(y1i, x0i) + w11 * tap(y1i, x1i))
    return out * inside[..., None].astype(out.dtype)


@partial(jax.jit, static_argnames=("kernel_size", "stride", "padding",
                                   "dilation", "deformable_groups"))
def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  kernel_size: int = 3, stride: int = 1, padding: int = 1,
                  dilation: int = 1,
                  mask: Optional[jnp.ndarray] = None,
                  deformable_groups: int = 1) -> jnp.ndarray:
    """Deformable conv v1/v2 forward.

    Args:
        x: (B, H, W, C) input.
        offset: (B, Ho, Wo, G*2*K) per-position (dy, dx) pairs, K = k*k, tap
            order row-major like the reference im2col; G = deformable_groups
            group-major like `deform_conv_cuda_kernel.cu` (each group of
            C/G input channels samples with its own offset field).
        weight: (kh, kw, C, Cout) HWIO kernel.
        mask: optional (B, Ho, Wo, G*K) modulation (DCNv2; already sigmoided).
    """
    B, H, W, C = x.shape
    k = kernel_size
    K = k * k
    G = deformable_groups
    if G > 1:
        # per-group offsets sample per-group input channels; the full-rank
        # kernel mixes groups only in the output contraction, so the output
        # is the sum over groups of single-group deform convs
        assert C % G == 0 and offset.shape[-1] == G * 2 * K, (C, offset.shape)
        cg = C // G
        out = None
        for g in range(G):
            part = deform_conv2d(
                x[..., g * cg:(g + 1) * cg],
                offset[..., g * 2 * K:(g + 1) * 2 * K],
                weight[:, :, g * cg:(g + 1) * cg, :], None,
                kernel_size, stride, padding, dilation,
                None if mask is None else mask[..., g * K:(g + 1) * K])
            out = part if out is None else out + part
        return out if bias is None else out + bias
    Ho = (H + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (k - 1) - 1) // stride + 1

    base_y = jnp.arange(Ho) * stride - padding
    base_x = jnp.arange(Wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(k) * dilation, jnp.arange(k) * dilation,
                          indexing="ij")
    ky = ky.reshape(-1).astype(jnp.float32)          # (K,)
    kx = kx.reshape(-1).astype(jnp.float32)

    off = offset.reshape(B, Ho, Wo, K, 2)
    ys = (base_y[None, :, None, None] + ky[None, None, None, :]
          + off[..., 0])                              # (B, Ho, Wo, K)
    xs = (base_x[None, None, :, None] + kx[None, None, None, :]
          + off[..., 1])

    sampled = jax.vmap(_bilinear_gather)(x, ys, xs)   # (B, Ho, Wo, K, C)
    if mask is not None:
        sampled = sampled * mask[..., None]
    w = weight.reshape(K, C, weight.shape[-1])
    out = jnp.einsum("bhwkc,kco->bhwo", sampled, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


@partial(jax.jit, static_argnames=("out_size", "spatial_scale", "sample_num",
                                   "gamma"))
def deform_roi_pooling(feats: jnp.ndarray, rois: jnp.ndarray,
                       offsets: Optional[jnp.ndarray] = None,
                       out_size: int = 7, spatial_scale: float = 1.0 / 16.0,
                       sample_num: int = 2, gamma: float = 0.1) -> jnp.ndarray:
    """Deformable RoI pooling: RoIAlign with learned per-bin offsets
    (deform_pool_cuda_kernel.cu semantics; offsets normalized by roi w/h and
    scaled by gamma)."""
    B, H, W, C = feats.shape
    R = rois.shape[0]
    s, sn = out_size, sample_num
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = (rois[:, 3] + 1.0) * spatial_scale
    y2 = (rois[:, 4] + 1.0) * spatial_scale
    rw = jnp.maximum(x2 - x1, 0.1)
    rh = jnp.maximum(y2 - y1, 0.1)
    bw, bh = rw / s, rh / s

    ph = jnp.arange(s, dtype=jnp.float32)
    frac = (jnp.arange(sn, dtype=jnp.float32) + 0.5) / sn
    off_grid = (ph[:, None] + frac[None, :]).reshape(-1)   # (s*sn,)
    ys = y1[:, None] + off_grid[None, :] * bh[:, None]     # (R, s*sn)
    xs = x1[:, None] + off_grid[None, :] * bw[:, None]
    ys = jnp.broadcast_to(ys[:, :, None], (R, s * sn, s * sn))
    xs = jnp.broadcast_to(xs[:, None, :], (R, s * sn, s * sn))
    if offsets is not None:
        oy = jnp.repeat(offsets[..., 0].reshape(R, s, s), sn, 1)
        oy = jnp.repeat(oy, sn, 2) * gamma * rh[:, None, None]
        ox = jnp.repeat(offsets[..., 1].reshape(R, s, s), sn, 1)
        ox = jnp.repeat(ox, sn, 2) * gamma * rw[:, None, None]
        ys = ys + oy
        xs = xs + ox

    def pool_one(b, ys_r, xs_r):
        return _bilinear_gather(feats[b], ys_r, xs_r)

    sampled = jax.vmap(pool_one)(batch_idx, ys, xs)        # (R, s*sn, s*sn, C)
    return sampled.reshape(R, s, sn, s, sn, C).mean(axis=(2, 4))


def masked_conv2d(x: jnp.ndarray, mask: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, padding: int = 1
                  ) -> jnp.ndarray:
    """MaskedConv2d: dense conv with output zeroed outside the mask.

    x: (B, H, W, C); mask: (B, H, W) or (B, H, W, 1); weight: HWIO.
    """
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    if mask.ndim == 3:
        mask = mask[..., None]
    return out * (mask > 0).astype(out.dtype)
