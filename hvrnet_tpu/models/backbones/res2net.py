"""Res2Net-v1b backbone (reference `mmdet/models/backbones/res2net_v1b.py`,
299 LoC): bottleneck with scale-split hierarchical 3×3 convs and the v1b
deep stem + avg-pool downsample.  Includes the Res2Layer shared head
(reference `mmdet/models/shared_heads/res2_layer.py`) and the ResXLayer
(resx_layer.py) for registry parity.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import ConvBN, max_pool_3x3_s2_p1
from ..registry import BACKBONES, SHARED_HEADS

RES2NET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    scales: int = 4
    base_width: int = 26
    with_downsample: bool = False
    stage_first: bool = False   # 'stage' mode: avg-pool instead of add chain
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0))
        identity = x
        out = ConvBN(width * self.scales, (1, 1), dtype=self.dtype,
                     name="conv1")(x)
        # split into `scales` groups; hierarchical 3×3 with running add
        splits = jnp.split(out, self.scales, axis=-1)
        ys = []
        prev = None
        for s in range(self.scales - 1):
            inp = splits[s]
            if prev is not None and not self.stage_first:
                inp = inp + prev
            y = ConvBN(width, (3, 3), (self.stride, self.stride)
                       if self.stage_first else (1, 1),
                       padding=self.dilation, dilation=(self.dilation,) * 2,
                       dtype=self.dtype, name=f"conv2_{s}")(inp)
            ys.append(y)
            prev = y
        last = splits[-1]
        if self.stage_first and self.stride > 1:
            last = nn.avg_pool(last, (3, 3), (self.stride, self.stride),
                               padding=((1, 1), (1, 1)))
        ys.append(last)
        out = jnp.concatenate(ys, axis=-1)
        out = ConvBN(self.planes * 4, (1, 1), relu=False, dtype=self.dtype,
                     name="conv3")(out)
        if self.with_downsample:
            ds = x
            if self.stride > 1:   # v1b: avg-pool then 1×1 (no strided conv)
                ds = nn.avg_pool(ds, (self.stride, self.stride),
                                 (self.stride, self.stride))
            ds = ConvBN(self.planes * 4, (1, 1), relu=False, dtype=self.dtype,
                        name="downsample")(ds)
            identity = ds
        return nn.relu(out + identity)


@BACKBONES.register_module
class Res2NetV1b(nn.Module):
    depth: int = 101
    scales: int = 4
    base_width: int = 26
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # v1b deep stem: three 3×3 convs
        x = ConvBN(32, (3, 3), (2, 2), padding=1, dtype=self.dtype,
                   name="stem1")(x)
        x = ConvBN(32, (3, 3), padding=1, dtype=self.dtype, name="stem2")(x)
        x = ConvBN(64, (3, 3), padding=1, dtype=self.dtype, name="stem3")(x)
        x = max_pool_3x3_s2_p1(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        blocks = RES2NET_BLOCKS[self.depth]
        for i in range(self.num_stages):
            planes = 64 * 2 ** i
            for j in range(blocks[i]):
                stride = self.strides[i] if j == 0 else 1
                need_ds = j == 0 and (stride != 1 or x.shape[-1] != planes * 4)
                x = Bottle2neck(planes, stride, self.dilations[i],
                                self.scales, self.base_width, need_ds,
                                stage_first=(j == 0), dtype=self.dtype,
                                name=f"layer{i + 1}_block{j}")(x)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@SHARED_HEADS.register_module
class Res2Layer(nn.Module):
    """Res2Net stage-4 shared head (reference res2_layer.py)."""
    depth: int = 101
    stage: int = 3
    stride: int = 1
    dilation: int = 2
    scales: int = 4
    base_width: int = 26
    norm_eval: bool = True
    norm_cfg: Any = None
    external_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..layers import ConvModule
        planes = 64 * 2 ** self.stage
        n = RES2NET_BLOCKS[self.depth][self.stage]
        for j in range(n):
            stride = self.stride if j == 0 else 1
            need_ds = j == 0 and (stride != 1 or x.shape[-1] != planes * 4)
            x = Bottle2neck(planes, stride, self.dilation, self.scales,
                            self.base_width, need_ds, stage_first=(j == 0),
                            dtype=self.dtype,
                            name=f"layer{self.stage + 1}_block{j}")(x)
        if self.external_conv:
            x = ConvModule(256, (1, 1), dtype=self.dtype, name="new_layer_1")(x)
        return x


@SHARED_HEADS.register_module
class ResXLayer(nn.Module):
    """ResNeXt stage-4 shared head (reference resx_layer.py)."""
    depth: int = 101
    stage: int = 3
    stride: int = 1
    dilation: int = 2
    groups: int = 32
    base_width: int = 4
    norm_eval: bool = True
    norm_cfg: Any = None
    external_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..layers import ConvModule
        from .resnet import ARCH_SETTINGS
        from .resnext import GroupedBottleneck
        planes = 64 * 2 ** self.stage
        n = ARCH_SETTINGS[self.depth][1][self.stage]
        for j in range(n):
            stride = self.stride if j == 0 else 1
            need_ds = j == 0 and (stride != 1 or x.shape[-1] != planes * 4)
            x = GroupedBottleneck(planes, self.groups, self.base_width,
                                  stride, self.dilation, need_ds, "pytorch",
                                  self.dtype,
                                  name=f"layer{self.stage + 1}_block{j}")(x)
        if self.external_conv:
            x = ConvModule(256, (1, 1), dtype=self.dtype, name="new_layer_1")(x)
        return x
