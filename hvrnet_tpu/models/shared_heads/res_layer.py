"""Shared head: dilated ResNet stage-4 + optional 1×1→256 external conv.

Reference `/root/reference/mmdet/models/shared_heads/res_layer.py:14-82`:
stage 3 (layer4) of R101 with stride 1 / dilation 2, caffe style, frozen BN,
then ``ConvModule(2048, 256, 1)`` (conv+bias+ReLU).  In the HVRNet configs
(`feat_from_shared_head=True`) this runs on the **whole C4 map** before
RoIAlign, so it is implemented as a plain NHWC map-level module.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ARCH_SETTINGS, ResLayerBlock
from ..layers import ConvModule
from ..registry import SHARED_HEADS


@SHARED_HEADS.register_module
class ResLayer(nn.Module):
    depth: int = 101
    stage: int = 3
    stride: int = 1
    dilation: int = 2
    style: str = "caffe"
    norm_eval: bool = True
    norm_cfg: Any = None
    external_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block, stage_blocks = ARCH_SETTINGS[self.depth]
        planes = 64 * 2 ** self.stage
        x = ResLayerBlock(block, planes, stage_blocks[self.stage],
                          self.stride, self.dilation, self.style, self.dtype,
                          name=f"layer{self.stage + 1}")(x)
        if self.external_conv:
            x = ConvModule(256, (1, 1), dtype=self.dtype, name="new_layer_1")(x)
        return x
