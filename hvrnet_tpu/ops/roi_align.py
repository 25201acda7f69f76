"""RoIAlign — gather-based XLA implementation (TPU-friendly, differentiable).

Bit-matches the sampling math of the reference CUDA kernel
(`/root/reference/mmdet/ops/roi_align/src/roi_align_kernel.cu:16-118`):
  * roi_end = (coord + 1) * spatial_scale   (the +1 pixel convention)
  * NO half-pixel offset on roi_start (non-aligned corners)
  * sample point  y = roi_start_h + ph*bin_h + (iy + .5) * bin_h / sample_num
  * bilinear with the kernel's exact edge rules (zero outside [-1, dim],
    clamp-at-0, collapse high==low at the far edge)

Dynamic-shape-free: a fixed number of RoIs per call; padded RoIs simply
produce garbage rows that callers mask downstream.  The gather decomposition
maps onto XLA's native gather/scatter, so forward and VJP both compile to
single fused TPU programs; the arithmetic (weighted sums over 4 taps ×
sample_num² samples) runs on the VPU while the gathers stream from HBM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sample_coords(feats_shape, rois, out_size, spatial_scale, sample_num):
    """Per-axis bilinear sample indices/weights — the single home of the
    CUDA kernel's coordinate conventions (+1 end offset, no half-pixel
    start, the clamp-at-0 / collapse-at-far-edge rules).  Shared by the
    forward and the separable adjoint so their conventions can never drift.

    Returns (batch_idx, (y_lo, y_hi, ly, y_in), (x_lo, x_hi, lx, x_in)),
    each index/weight array (R, out_size·sample_num)."""
    B, H, W, _ = feats_shape
    s = out_size
    sn = sample_num
    batch_idx = rois[:, 0].astype(jnp.int32)
    roi_start_w = rois[:, 1] * spatial_scale
    roi_start_h = rois[:, 2] * spatial_scale
    roi_end_w = (rois[:, 3] + 1.0) * spatial_scale
    roi_end_h = (rois[:, 4] + 1.0) * spatial_scale
    bin_w = jnp.maximum(roi_end_w - roi_start_w, 0.0) / s
    bin_h = jnp.maximum(roi_end_h - roi_start_h, 0.0) / s

    # sample coordinates: (R, s*sn) per axis
    ph = jnp.arange(s, dtype=jnp.float32)
    iy = (jnp.arange(sn, dtype=jnp.float32) + 0.5) / sn
    off = (ph[:, None] + iy[None, :]).reshape(-1)  # (s*sn,) bin+frac offsets
    ys = roi_start_h[:, None] + off[None, :] * bin_h[:, None]  # (R, s*sn)
    xs = roi_start_w[:, None] + off[None, :] * bin_w[:, None]  # (R, s*sn)

    def interp_axis(v, dim):
        """Returns (low_idx, high_idx, lerp_weight, inside_mask) per coordinate."""
        inside = (v >= -1.0) & (v <= dim)
        v = jnp.maximum(v, 0.0)
        low = v.astype(jnp.int32)
        at_edge = low >= dim - 1
        low = jnp.where(at_edge, dim - 1, low)
        high = jnp.where(at_edge, dim - 1, low + 1)
        frac = jnp.where(at_edge, 0.0, v - low.astype(jnp.float32))
        return low, high, frac, inside

    return batch_idx, interp_axis(ys, H), interp_axis(xs, W)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_align(feats: jnp.ndarray, rois: jnp.ndarray, out_size: int = 7,
              spatial_scale: float = 1.0 / 16.0, sample_num: int = 2) -> jnp.ndarray:
    """RoIAlign forward.

    Args:
        feats: (B, H, W, C) NHWC feature map.
        rois: (R, 5) rows of [batch_idx, x1, y1, x2, y2] in image coords.
        out_size: pooled spatial size (7).
        spatial_scale: feature stride inverse (1/16).
        sample_num: sampling grid per bin per axis (2).

    Returns:
        (R, out_size, out_size, C) pooled features.
    """
    B, H, W, C = feats.shape
    R = rois.shape[0]
    s = out_size
    sn = sample_num

    batch_idx, (y_lo, y_hi, ly, y_in), (x_lo, x_hi, lx, x_in) = \
        _sample_coords(feats.shape, rois, out_size, spatial_scale, sample_num)
    hy, hx = 1.0 - ly, 1.0 - lx

    if B == 1:
        # Separable-matmul formulation: the sample positions form a regular
        # (row × col) grid per RoI, and bilinear weights factorize
        # (wy·wx), so sampling is two dense contractions
        # pooled = Wy @ C5 @ Wxᵀ — MXU work instead of ~R·(s·sn)²·4 gathers.
        # Measured on v5e at 300×7×7×1024: 2.66 ms (gather) → MXU-bound
        # sub-ms; bit-identical in f32 (the extra terms are exact zeros).
        def axis_weights(lo, hi, frac, inside, dim):
            ar = jnp.arange(dim)
            w = ((1.0 - frac)[..., None] * (ar == lo[..., None])
                 + frac[..., None] * (ar == hi[..., None]))
            return w * inside[..., None].astype(jnp.float32)   # (R, s·sn, dim)

        wy_mat = axis_weights(y_lo, y_hi, ly, y_in, H)
        wx_mat = axis_weights(x_lo, x_hi, lx, x_in, W)
        # The contraction dtype follows the feature dtype: f32 features keep
        # the bit-exact-vs-CUDA f32 math the parity tests assert (average the
        # sn×sn samples AFTER sampling, like the kernel); bf16 features (the
        # inference path — everything upstream is already bf16) run the
        # einsums on the MXU at bf16 rates with f32 accumulation, and the
        # sn-sample mean folds INTO the axis weights (pooling is linear and
        # separable), shrinking the (R, s·sn, W, C) intermediate — the
        # HBM-bound term — and the FLOPs by sn² = 4×.  Weight matrices hold
        # exact {frac, 1-frac, 0} taps; bf16 rounds frac to 8 mantissa bits —
        # covered by the end-to-end bf16 accuracy budget
        # (tests/test_bf16_budget.py).
        if feats.dtype == jnp.float32:
            f0 = feats[0]
            t1 = jnp.einsum("riy,yxc->rixc", wy_mat, f0,
                            preferred_element_type=jnp.float32)
            val = jnp.einsum("rixc,rjx->rijc", t1, wx_mat,
                             preferred_element_type=jnp.float32)
            return val.reshape(R, s, sn, s, sn, C).mean(axis=(2, 4))
        cdt = feats.dtype
        wy_p = wy_mat.reshape(R, s, sn, H).mean(axis=2)       # (R, s, H)
        wx_p = wx_mat.reshape(R, s, sn, W).mean(axis=2)       # (R, s, W)
        f0 = feats[0].astype(cdt)
        t1 = jnp.einsum("riy,yxc->rixc", wy_p.astype(cdt), f0,
                        preferred_element_type=jnp.float32)
        return jnp.einsum("rixc,rjx->rijc", t1.astype(cdt),
                          wx_p.astype(cdt),
                          preferred_element_type=jnp.float32)
    else:
        flat = feats.reshape(B * H * W, C)
        base = (batch_idx * (H * W))[:, None, None]  # (R,1,1)

        def tap(yi, xi):
            idx = base + yi[:, :, None] * W + xi[:, None, :]  # (R, s*sn, s*sn)
            return flat[idx.reshape(-1)].reshape(R, s * sn, s * sn, C)

        w1 = (hy[:, :, None] * hx[:, None, :])
        w2 = (hy[:, :, None] * lx[:, None, :])
        w3 = (ly[:, :, None] * hx[:, None, :])
        w4 = (ly[:, :, None] * lx[:, None, :])
        mask = (y_in[:, :, None] & x_in[:, None, :]).astype(jnp.float32)

        val = (w1[..., None] * tap(y_lo, x_lo) + w2[..., None] * tap(y_lo, x_hi)
               + w3[..., None] * tap(y_hi, x_lo) + w4[..., None] * tap(y_hi, x_hi))
        val = val * mask[..., None]

    # average the sn×sn samples inside each bin
    val = val.reshape(R, s, sn, s, sn, C).mean(axis=(2, 4))
    return val


def _sep_pooled_weights(feats_shape, rois, out_size, spatial_scale,
                        sample_num):
    """Separable per-axis sampling matrices with the sn-sample mean folded
    in: wy (R, s, B·H) over GLOBAL rows (batch folded into the y axis — each
    sample row touches exactly one image) and wx (R, s, W).  The bilinear
    kernel factorizes wy·wx and pooling is linear, so
    pooled = Wy @ feats @ Wxᵀ and the adjoint is two more contractions."""
    B, H, W, _ = feats_shape
    s, sn = out_size, sample_num
    batch_idx, (y_lo, y_hi, ly, y_in), (x_lo, x_hi, lx, x_in) = \
        _sample_coords(feats_shape, rois, out_size, spatial_scale, sample_num)

    def weights(lo, hi, fr, inside, dim, offs):
        ar = jnp.arange(dim)
        lo = lo + offs
        hi = hi + offs
        w = ((1.0 - fr)[..., None] * (ar == lo[..., None])
             + fr[..., None] * (ar == hi[..., None]))
        w = w * inside[..., None].astype(jnp.float32)     # (R, s·sn, dim)
        return w.reshape(w.shape[0], s, sn, dim).mean(axis=2)

    wy = weights(y_lo, y_hi, ly, y_in, B * H, (batch_idx * H)[:, None])
    wx = weights(x_lo, x_hi, lx, x_in, W, 0)
    return wy, wx


def _roi_align_fwd(feats, rois, out_size, spatial_scale, sample_num):
    # residuals: a 0-d dtype witness + static shape + rois
    return roi_align(feats, rois, out_size, spatial_scale, sample_num), \
        (jnp.zeros((), feats.dtype), jnp.asarray(feats.shape[:0]), feats.shape, rois)


def _roi_align_bwd(out_size, spatial_scale, sample_num, res, g):
    """Backward via the separable-matmul adjoint.

    dfeats = Σ_r Wy[r]ᵀ @ g[r] @ Wx[r] with the batch folded into Wy's row
    axis — pure MXU contractions.  Autodiff of the forward's gather lowers
    to a scatter over ~R·(7·2)²·4 indices (near-serial on TPU, ~20 s/step
    measured in round 1); the earlier sort-based segment_sum fix ran in
    milliseconds but still cost 3.4 ms per call at 608×1008 training shapes
    — the contraction form is ~10× cheaper again and is the exact adjoint
    in real arithmetic.  RoIs get no gradient (matches the reference custom
    autograd Function, roi_align.py:9-50).
    """
    dtype_ref, _, feats_shape, rois = res
    feats_dtype = dtype_ref.dtype
    B, H, W, C = feats_shape
    wy, wx = _sep_pooled_weights(feats_shape, rois, out_size, spatial_scale,
                                 sample_num)                  # (R,s,BH),(R,s,W)
    cdt = jnp.float32 if feats_dtype == jnp.float32 else feats_dtype
    gg = g.astype(cdt)                                        # (R, s, s, C)
    t = jnp.einsum("rijc,rjx->rixc", gg, wx.astype(cdt),
                   preferred_element_type=jnp.float32)        # (R, s, W, C)
    dflat = jnp.einsum("rixc,riy->yxc", t.astype(cdt), wy.astype(cdt),
                       preferred_element_type=jnp.float32)    # (BH, W, C)
    dfeats = dflat.reshape(B, H, W, C).astype(feats_dtype)
    return dfeats, jnp.zeros_like(rois)


roi_align.defvjp(_roi_align_fwd, _roi_align_bwd)
