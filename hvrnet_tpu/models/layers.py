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
    """BatchNorm with frozen statistics and affine params (inference form)."""
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
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
