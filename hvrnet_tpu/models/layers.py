"""Common NN building blocks (flax.linen, NHWC, TPU-friendly dtypes).

Frozen BatchNorm: both reference configs run every BN with
``requires_grad=False`` + ``norm_eval=True``
(`/root/reference/configs/faster_rcnn_r101_selsa_c5.py:3,28`), i.e. BN is a
constant per-channel affine using stored running statistics.  ``FrozenBN``
keeps the four torch-compatible parameter tensors (for checkpoint import
parity) but applies them as a single fused scale/bias, which XLA folds into
the preceding convolution.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics and affine params (inference form).

    Calibration mode (``apply(..., mutable=["calib"])`` — see
    engine/calibrate.py): normalizes with THIS input's per-channel moments
    instead of the stored statistics and sows them into the ``calib``
    collection, so every downstream module already sees post-calibration
    activations and the whole network calibrates exactly in one forward
    (LSUV-style).  The branch is a trace-time conditional — the normal
    inference/training apply is untouched."""
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        if self.is_mutable_collection("calib") and not self.is_initializing():
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mu = xf.mean(axes)
            m2 = (xf * xf).mean(axes)
            self.sow("calib", "mean", mu, reduce_fn=lambda a, b: b)
            self.sow("calib", "m2", m2, reduce_fn=lambda a, b: b)
            mean = mu
            # dead channels (constant input) stay inert: x − mean ≡ 0
            var = jnp.maximum(m2 - mu * mu, 1e-8)
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        bias = beta - mean * scale
        # frozen statistics never receive gradient
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def Conv(features: int, kernel_size: Tuple[int, int] = (3, 3),
         strides: Tuple[int, int] = (1, 1), padding: int = 0,
         dilation: Tuple[int, int] = (1, 1), use_bias: bool = True,
         dtype: Dtype = jnp.float32,
         kernel_init: Callable = nn.initializers.he_normal(),
         bias_init: Callable = nn.initializers.zeros,
         name: str = "conv") -> nn.Conv:
    """2D conv factory, NHWC; `padding` follows torch semantics (symmetric int)."""
    pad = ((padding, padding), (padding, padding))
    return nn.Conv(features=features, kernel_size=kernel_size, strides=strides,
                   padding=pad, kernel_dilation=dilation, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=kernel_init, bias_init=bias_init, name=name)


class ConvBN(nn.Module):
    """conv (no bias) + frozen BN [+ relu] — the backbone's repeated unit."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    dilation: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                 self.dilation, use_bias=False, dtype=self.dtype)(x)
        x = FrozenBN(self.features, dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class _StemKernel(nn.Module):
    """Parameter container so the s2d stem keeps the plain-conv param path
    (``stem/conv/kernel``, HWIO (7, 7, 3, 64)) for checkpoint-converter
    parity."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.he_normal(),
                          (7, 7, 3, 64), jnp.float32)


class _StemBN(nn.Module):
    """FrozenBN's four parameter tensors without its broadcast — the fused
    stem applies them over (r, s, o)-grouped channels.  In calibration mode
    the caller passes the observed (mean, mean-of-squares) of the plain stem
    conv output; they are sown into ``calib`` and used in place of the
    stored statistics (see FrozenBN)."""
    features: int = 64

    @nn.compact
    def __call__(self, calib_moments=None):
        g = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        m = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        v = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        if calib_moments is not None:
            mu, m2 = calib_moments
            self.sow("calib", "mean", mu, reduce_fn=lambda a, b: b)
            self.sow("calib", "m2", m2, reduce_fn=lambda a, b: b)
            m = mu
            v = jnp.maximum(m2 - mu * mu, 1e-8)
        return g, b, m, v


def _stem_s2d_maps():
    """Static tap maps for the block-4 s2d stem: index into the 8-row
    zero-padded kernel, with 7 ≡ the zero row for out-of-support taps."""
    import numpy as np
    amap = np.full((3, 4, 2), 7, np.int32)          # [alpha+1, p, r]
    for al in (-1, 0, 1):
        for p in range(4):
            for r in range(2):
                a = 4 * al + p + 3 - 2 * r
                if 0 <= a < 7:
                    amap[al + 1, p, r] = a
    return amap


_STEM_AMAP = _stem_s2d_maps()


class StemBlock(nn.Module):
    """The ResNet stem (7×7/2 conv + frozen BN + relu + 3×3/2 maxpool) as a
    block-4 space-to-depth pipeline that never materializes the half-res
    grid.

    3-input-channel convs are the worst case for the TPU MXU — XLA lowers
    the NHWC 7×7/2 stem through strided im2col/layout fusions measured at
    ~0.8-1.2 ms/frame at 608×1008 (profile, BASELINE.md round 3).  This is
    the MLPerf-style space-to-depth rewrite, taken one step further by
    folding the maxpool:

      * input (H, W, 3) → one-hot 4×4/4 conv → coarse grid (H/4, W/4, 48)
      * the 7×7/2 conv becomes a 3×3/1 conv with 48→256 channels whose
        output channels are (r, s, o) = the 2×2 fine positions within each
        coarse cell:  out[2Y+r, 2X+s, o] = Σ w[4α+p+3−2r, 4β+q+3−2s] ·
        s2d[Y+α, X+β, (p,q,·)]  — the stored (7,7,3,64) kernel is only
        REARRANGED (converter parity; out-of-support taps are exact zeros)
      * BN + relu apply with the per-o scale tiled over (r, s)
      * the 3×3/2 maxpool lands exactly on the coarse grid:
        pool[Y,X] = max over {(α,r)} × {(β,s)}, (α,r) ∈
        {(−1,1),(0,0),(0,1)} — nine shifted elementwise maxima, no
        reduce-window, output (H/4, W/4, 64)

    Exact vs the plain path up to reduction order (verified ≤ 1 bf16 ulp /
    2.4e-6 f32 at 608×1008).  Falls back to the plain conv+pool for inputs
    not divisible by 4 (canvases are ÷16, so the fast path always runs in
    practice).

    Honest accounting (per-op xplane trace, the trustworthy source on this
    tenancy-noisy relay — BASELINE.md round 3): the conv work drops 0.77 →
    0.12 ms/frame, but XLA spends what it saved on input layout changes
    (the s2d transpose of the awkward 3-channel image), so whole-backbone
    module time is NET NEUTRAL on v5e at 608×1008 (2.71 → 2.81 ms under
    trace conditions).  Kept because the MXU work is genuinely 6× lower —
    wherever XLA's layout assignment improves or the input arrives
    pre-blocked, the win materializes — and the form is exact and tested
    either way."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = _StemKernel(name="conv")()
        B, H, W, C = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if self.is_mutable_collection("calib") and not self.is_initializing():
            # calibration mode (engine/calibrate.py): plain conv path, BN
            # statistics from THIS output's moments (performance irrelevant)
            out = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=dn)
            mu = out.mean((0, 1, 2))
            m2 = (out * out).mean((0, 1, 2))
            g, b, m, v = _StemBN(name="bn")((mu, m2))
            scale = jax.lax.stop_gradient(g * jax.lax.rsqrt(v + 1e-5))
            bias = jax.lax.stop_gradient(b - m * scale)
            out = (out * scale + bias).astype(self.dtype)
            return max_pool_3x3_s2_p1(nn.relu(out))
        g, b, m, v = _StemBN(name="bn")()
        scale = g * jax.lax.rsqrt(v + 1e-5)
        bias = b - m * scale
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        if H % 4 == 0 and W % 4 == 0 and C == 3:
            # one-hot space-to-depth conv: (H, W, 3) -> (H/4, W/4, 48).
            # The conv form is the best of three lowerings tried for this
            # layout change (trace, BASELINE.md round 4): plain 7×7/2 conv
            # ~0.8-1.2 ms in input layout fusions; one-hot conv ~0.26 ms
            # (copy + select_bitcast retile of the 3-channel input); pure
            # reshape/transpose ~0.37 ms (XLA lowers the (H/4,4,W/4,4,3)
            # permute as copy+reshape, measured backbone 2.054 → 2.180 ms).
            eye = jnp.eye(48, dtype=self.dtype).reshape(4, 4, 3, 48)
            xs = jax.lax.conv_general_dilated(
                x.astype(self.dtype), eye, (4, 4), ((0, 0), (0, 0)),
                dimension_numbers=dn)
            # rearranged kernel (3, 3, (p,q,c)=48, (r,s,o)=256)
            k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
            am = jnp.asarray(_STEM_AMAP)                       # (3, 4, 2)
            k2 = k8[am[:, None, :, None, :, None],             # a index
                    am[None, :, None, :, None, :]]             # b: -> [al,be,p,q,r,s,c,o]
            k2 = k2.transpose(0, 1, 2, 3, 6, 4, 5, 7)          # [al,be,p,q,c,r,s,o]
            k2 = k2.reshape(3, 3, 48, 256)
            y = jax.lax.conv_general_dilated(
                xs, k2.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn)
            y = y * jnp.tile(scale, 4).astype(self.dtype) \
                + jnp.tile(bias, 4).astype(self.dtype)
            y = nn.relu(y)
            Hc, Wc = H // 4, W // 4
            t = y.reshape(B, Hc, Wc, 2, 2, 64)
            # zero padding ≡ max_pool's -inf padding because t is relu'd (≥0)
            tp = jnp.pad(t, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            out = None
            for ay, r in ((0, 1), (1, 0), (1, 1)):
                for ax, s in ((0, 1), (1, 0), (1, 1)):
                    c = tp[:, ay:ay + Hc, ax:ax + Wc, r, s, :]
                    out = c if out is None else jnp.maximum(out, c)
            return out
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=dn)
        out = out * scale.astype(self.dtype) + bias.astype(self.dtype)
        return max_pool_3x3_s2_p1(nn.relu(out))


class ConvModule(nn.Module):
    """Reference mmdet ConvModule default: conv(+bias) → ReLU, no norm.

    Used by the shared head's ``external_conv``
    (`/root/reference/mmdet/models/shared_heads/res_layer.py:50-52`).
    """
    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    activation: Optional[str] = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                 dtype=self.dtype)(x)
        if self.activation == "relu":
            x = nn.relu(x)
        return x


class ConvWS(nn.Module):
    """Weight-standardized conv (reference `mmdet/models/utils/conv_ws.py`):
    the kernel is normalized per OUTPUT channel to zero mean / unit std
    (+eps) before the convolution — the conv_cfg=dict(type='ConvWS') option
    zoo configs pair with GN.  Torch standardizes over (Cin, kh, kw) per
    output channel; HWIO axes (0, 1, 2) here are the same set."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        # torch .std() is the Bessel-corrected sample std
        std = kernel.std(axis=(0, 1, 2), keepdims=True, ddof=1)
        kernel = (kernel - mean) / (std + self.eps)
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def dense(features: int, std: float = 0.01, dtype: Dtype = jnp.float32,
          name: Optional[str] = None) -> nn.Dense:
    """nn.Linear equivalent with the reference's normal(0, std) init."""
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=normal_init(std),
                    bias_init=nn.initializers.zeros, name=name)


class Linear(nn.Module):
    features: int
    std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return dense(self.features, self.std, self.dtype, name="fc")(x)


def max_pool_3x3_s2_p1(x):
    """torch nn.MaxPool2d(3, stride=2, padding=1) equivalent in NHWC."""
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
