"""RoIPool (max pooling) — XLA gather implementation.

Parity op for `/root/reference/mmdet/ops/roi_pool/src/roi_pool_kernel.cu`
(argmax-backward max pooling; unused by the two shipped configs, which use
RoIAlign).  Bin boundaries follow the kernel: start = round(coord * scale),
width = max(end - start + 1, 1), per-bin [floor, ceil) ranges clamped to the
map.  Each bin is reduced with a masked max over a static window of
``MAX_BIN`` integer positions per axis; bins wider than ``MAX_BIN`` pixels
(not reachable at the shipped 1000×600 operating point with out_size 7) are
truncated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_BIN = 32


@partial(jax.jit, static_argnames=("out_size", "spatial_scale"))
def roi_pool(feats: jnp.ndarray, rois: jnp.ndarray, out_size: int = 7,
             spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """feats: (B, H, W, C) NHWC; rois: (R, 5) → (R, out_size, out_size, C)."""
    B, H, W, C = feats.shape
    R = rois.shape[0]
    s = out_size

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
    bin_w = roi_w / s
    bin_h = roi_h / s

    ph = jnp.arange(s, dtype=jnp.float32)

    def bin_range(start, bin_sz, dim):
        lo = jnp.floor(ph[None, :] * bin_sz[:, None]).astype(jnp.int32) + start[:, None]
        hi = jnp.ceil((ph[None, :] + 1.0) * bin_sz[:, None]).astype(jnp.int32) + start[:, None]
        lo = jnp.clip(lo, 0, dim - 1)
        hi = jnp.clip(hi, 0, dim)
        return lo, hi  # (R, s)

    y_lo, y_hi = bin_range(y1, bin_h, H)
    x_lo, x_hi = bin_range(x1, bin_w, W)

    k = jnp.arange(MAX_BIN)
    ys = y_lo[:, :, None] + k[None, None, :]               # (R, s, K)
    y_ok = ys < y_hi[:, :, None]
    xs = x_lo[:, :, None] + k[None, None, :]
    x_ok = xs < x_hi[:, :, None]
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)

    flat = feats.reshape(B * H * W, C)
    base = (batch_idx * (H * W))[:, None, None, None, None]
    idx = base + ys[:, :, None, :, None] * W + xs[:, None, :, None, :]  # (R,s,s,K,K)
    vals = flat[idx.reshape(-1)].reshape(R, s, s, MAX_BIN, MAX_BIN, C)
    ok = (y_ok[:, :, None, :, None] & x_ok[:, None, :, None, :])[..., None]
    vals = jnp.where(ok, vals, -jnp.inf)
    out = vals.max(axis=(3, 4))
    # empty bins (hstart>=hend) → 0, matching the CUDA kernel's maxval=0 init
    return jnp.where(jnp.isfinite(out), out, 0.0)
