"""Caffe-style ResNet backbone (flax.linen, NHWC).

Re-implements the behaviour of `/root/reference/mmdet/models/backbones/resnet.py`
for the configuration the two shipped configs exercise: depth 101, caffe style
(stride on the first 1×1 of each bottleneck, resnet.py:127-132), num_stages 3,
strides (1,2,2), dilations (1,1,1), out_indices (2,), frozen_stages 1, all BN
frozen.  ``make_res_layer``'s downsample is a 1×1 conv+BN (resnet.py:269-296).

TPU notes: NHWC layout; compute dtype configurable (bf16 for speed);
``frozen_stages`` is realized with ``stop_gradient`` instead of
``requires_grad`` flags; frozen BN folds to scale/bias at compile time.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBN, max_pool_3x3_s2_p1
from ..registry import BACKBONES

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = "pytorch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     padding=self.dilation, dilation=(self.dilation,) * 2,
                     dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.planes, (3, 3), padding=1, relu=False,
                     dtype=self.dtype, name="conv2")(out)
        if self.with_downsample:
            identity = ConvBN(self.planes, (1, 1), (self.stride, self.stride),
                              relu=False, dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """caffe: stride on conv1 (1×1); pytorch: stride on conv2 (3×3)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = "caffe"
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        conv1_stride, conv2_stride = ((self.stride, 1) if self.style == "caffe"
                                      else (1, self.stride))
        identity = x
        out = ConvBN(self.planes, (1, 1), (conv1_stride,) * 2,
                     dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.planes, (3, 3), (conv2_stride,) * 2,
                     padding=self.dilation, dilation=(self.dilation,) * 2,
                     dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.planes * self.expansion, (1, 1), relu=False,
                     dtype=self.dtype, name="conv3")(out)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride,) * 2, relu=False,
                              dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class ResLayerBlock(nn.Module):
    """One ResNet stage: `make_res_layer` (reference resnet.py:269-330)."""
    block: str
    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    style: str = "caffe"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        blk_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        in_ch = x.shape[-1]
        need_ds = self.stride != 1 or in_ch != self.planes * expansion
        x = blk_cls(self.planes, self.stride, self.dilation, need_ds,
                    self.style, self.dtype, name="block0")(x)
        for i in range(1, self.num_blocks):
            x = blk_cls(self.planes, 1, self.dilation, False, self.style,
                        self.dtype, name=f"block{i}")(x)
        return x


@BACKBONES.register_module
class ResNet(nn.Module):
    """ResNet backbone with partial stages (reference resnet.py:333-483)."""
    depth: int = 101
    num_stages: int = 3
    strides: Sequence[int] = (1, 2, 2)
    dilations: Sequence[int] = (1, 1, 1)
    out_indices: Sequence[int] = (2,)
    frozen_stages: int = 1
    style: str = "caffe"
    norm_eval: bool = True          # BN is always frozen here (FrozenBN)
    norm_cfg: Any = None            # accepted for config parity; unused
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block, stage_blocks = ARCH_SETTINGS[self.depth]
        # stem: 7×7/2 conv + BN + relu + 3×3/2 maxpool
        x = ConvBN(64, (7, 7), (2, 2), padding=3, dtype=self.dtype, name="stem")(x)
        x = max_pool_3x3_s2_p1(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for i in range(self.num_stages):
            planes = 64 * 2 ** i
            x = ResLayerBlock(block, planes, stage_blocks[i],
                              self.strides[i], self.dilations[i], self.style,
                              self.dtype, name=f"layer{i + 1}")(x)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
