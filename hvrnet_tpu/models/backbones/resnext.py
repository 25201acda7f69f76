"""ResNeXt + SSD-VGG backbones (reference `mmdet/models/backbones/resnext.py`,
`ssd_vgg.py`) — zoo parity."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Conv, FrozenBN, max_pool_3x3_s2_p1
from ..registry import BACKBONES
from .resnet import ARCH_SETTINGS


class GroupedBottleneck(nn.Module):
    planes: int
    groups: int = 32
    base_width: int = 4
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = "pytorch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        conv1_stride, conv2_stride = ((self.stride, 1) if self.style == "caffe"
                                      else (1, self.stride))
        identity = x
        out = Conv(width, (1, 1), (conv1_stride,) * 2, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBN(width, dtype=self.dtype, name="bn1")(out))
        out = nn.Conv(width, (3, 3), (conv2_stride,) * 2,
                      padding=((self.dilation,) * 2,) * 2,
                      kernel_dilation=(self.dilation,) * 2,
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv2")(out)
        out = nn.relu(FrozenBN(width, dtype=self.dtype, name="bn2")(out))
        out = Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                   name="conv3")(out)
        out = FrozenBN(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.with_downsample:
            identity = Conv(self.planes * 4, (1, 1), (self.stride,) * 2,
                            use_bias=False, dtype=self.dtype,
                            name="ds_conv")(x)
            identity = FrozenBN(self.planes * 4, dtype=self.dtype,
                                name="ds_bn")(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module
class ResNeXt(nn.Module):
    depth: int = 101
    groups: int = 32
    base_width: int = 4
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    style: str = "pytorch"
    norm_eval: bool = True
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                 dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(FrozenBN(64, dtype=self.dtype, name="stem_bn")(x))
        x = max_pool_3x3_s2_p1(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        in_planes = 64
        for i in range(self.num_stages):
            planes = 64 * 2 ** i
            for j in range(stage_blocks[i]):
                stride = self.strides[i] if j == 0 else 1
                need_ds = j == 0 and (stride != 1 or in_planes != planes * 4)
                x = GroupedBottleneck(planes, self.groups, self.base_width,
                                      stride, self.dilations[i], need_ds,
                                      self.style, self.dtype,
                                      name=f"layer{i + 1}_block{j}")(x)
                in_planes = planes * 4
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module
class SSDVGG(nn.Module):
    """ssd_vgg.py — VGG16 + SSD extra layers, two output scales + extras."""
    input_size: int = 300
    depth: int = 16
    out_indices: Sequence[int] = (3, 4)
    out_feature_indices: Sequence[int] = (22, 34)
    l2_norm_scale: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfgs = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512]
        outs = []
        block = 0
        for i, v in enumerate(cfgs):
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                block += 1
            else:
                x = nn.relu(Conv(v, (3, 3), padding=1, dtype=self.dtype,
                                 name=f"conv{i}")(x))
            if block == 3 and v == 512 and 3 in self.out_indices \
                    and len(outs) == 0:
                # conv4_3 output with L2 norm (ssd_vgg.py L2Norm)
                scale = self.param("l2_norm_scale",
                                   lambda k, s: jnp.full(
                                       s, self.l2_norm_scale, jnp.float32),
                                   (x.shape[-1],))
                norm = jnp.sqrt((x ** 2).sum(-1, keepdims=True) + 1e-10)
                outs.append(x / norm * scale)
        # fc6/fc7 as dilated convs
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.relu(Conv(1024, (3, 3), padding=6, dilation=(6, 6),
                         dtype=self.dtype, name="fc6")(x))
        x = nn.relu(Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(x))
        outs.append(x)
        # SSD extra feature layers
        extra_cfg = [(256, 1, 1, 0), (512, 3, 2, 1), (128, 1, 1, 0),
                     (256, 3, 2, 1), (128, 1, 1, 0), (256, 3, 1, 0),
                     (128, 1, 1, 0), (256, 3, 1, 0)]
        for i, (c, k, s, p) in enumerate(extra_cfg):
            x = nn.relu(Conv(c, (k, k), (s, s), padding=p, dtype=self.dtype,
                             name=f"extra{i}")(x))
            if i % 2 == 1:
                outs.append(x)
        return tuple(outs)
