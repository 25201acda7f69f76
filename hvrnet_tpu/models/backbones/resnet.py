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

from ..layers import ConvBN, StemBlock
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
    """caffe: stride on conv1 (1×1); pytorch: stride on conv2 (3×3).

    Optional per-block plugins mirror the reference Bottleneck
    (resnet.py:86-267): ``dcn`` replaces conv2 with a deformable conv (v1/v2,
    offsets from a zero-init regular conv), ``gen_attention`` runs after
    conv2's relu on ``planes`` channels (ref:243-244), ``gcb`` after conv3's
    BN on ``planes*4`` channels (ref:249-250).
    """
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    style: str = "caffe"
    dtype: Any = jnp.float32
    expansion: int = 4
    dcn: Any = None
    gcb: Any = None
    gen_attention: Any = None

    @nn.compact
    def __call__(self, x):
        from ..layers import Conv, FrozenBN
        from ..plugins import ContextBlock, GeneralizedAttention

        conv1_stride, conv2_stride = ((self.stride, 1) if self.style == "caffe"
                                      else (1, self.stride))
        identity = x
        out = ConvBN(self.planes, (1, 1), (conv1_stride,) * 2,
                     dtype=self.dtype, name="conv1")(x)
        use_dcn = (self.dcn is not None
                   and not (self.dcn.get("fallback_on_stride", False)
                            and conv2_stride > 1))
        if use_dcn:
            from ...ops.deform import deform_conv2d
            groups = int(self.dcn.get("deformable_groups", 1))
            assert groups == 1, "deformable_groups>1 not supported"
            modulated = bool(self.dcn.get("modulated", False))
            off_ch = (27 if modulated else 18) * groups
            # offset/mask conv initialises to zero (reference
            # conv_offset init, deform_conv.py:Conv2d zero_init)
            off = Conv(off_ch, (3, 3), (conv2_stride,) * 2,
                       padding=self.dilation, dilation=(self.dilation,) * 2,
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv2_offset")(out)
            weight = self.param(
                "conv2_kernel", nn.initializers.he_normal(),
                (3, 3, self.planes, self.planes), jnp.float32)
            if modulated:
                offset = off[..., :18 * groups]
                mask = jax.nn.sigmoid(off[..., 18 * groups:])
            else:
                offset, mask = off, None
            out = deform_conv2d(out, offset, weight.astype(self.dtype),
                                stride=conv2_stride, padding=self.dilation,
                                dilation=self.dilation, mask=mask)
            out = FrozenBN(self.planes, dtype=self.dtype, name="conv2_bn")(out)
            out = nn.relu(out)
        else:
            out = ConvBN(self.planes, (3, 3), (conv2_stride,) * 2,
                         padding=self.dilation, dilation=(self.dilation,) * 2,
                         dtype=self.dtype, name="conv2")(out)
        if self.gen_attention is not None:
            out = GeneralizedAttention(in_channels=self.planes,
                                       dtype=self.dtype,
                                       name="gen_attention_block",
                                       **self.gen_attention)(out)
        out = ConvBN(self.planes * self.expansion, (1, 1), relu=False,
                     dtype=self.dtype, name="conv3")(out)
        if self.gcb is not None:
            out = ContextBlock(in_channels=self.planes * self.expansion,
                               dtype=self.dtype, name="context_block",
                               **self.gcb)(out)
        if self.with_downsample:
            identity = ConvBN(self.planes * self.expansion, (1, 1),
                              (self.stride,) * 2, relu=False,
                              dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class ResLayerBlock(nn.Module):
    """One ResNet stage: `make_res_layer` (reference resnet.py:269-330).

    ``gen_attention_blocks`` lists the block indices that get the attention
    plugin (ref:310,326); dcn/gcb apply to every block of the stage.
    ``with_cp`` rematerialises each block (the torch checkpointing at
    ref:258-261, realized as jax.checkpoint)."""
    block: str
    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    style: str = "caffe"
    dtype: Any = jnp.float32
    dcn: Any = None
    gcb: Any = None
    gen_attention: Any = None
    gen_attention_blocks: Sequence[int] = ()
    with_cp: bool = False

    @nn.compact
    def __call__(self, x):
        blk_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.block != "bottleneck":
            assert not (self.dcn or self.gcb or
                        (self.gen_attention and
                         tuple(self.gen_attention_blocks))), \
                "plugins require bottleneck blocks (reference resnet.py:32-34)"
        if self.with_cp:
            blk_cls = nn.remat(blk_cls)
        expansion = 4 if self.block == "bottleneck" else 1
        in_ch = x.shape[-1]
        need_ds = self.stride != 1 or in_ch != self.planes * expansion
        for i in range(self.num_blocks):
            kw = {}
            if self.block == "bottleneck":
                kw = dict(dcn=self.dcn, gcb=self.gcb,
                          gen_attention=(self.gen_attention
                                         if i in tuple(self.gen_attention_blocks)
                                         else None))
            x = blk_cls(self.planes, self.stride if i == 0 else 1,
                        self.dilation, need_ds if i == 0 else False,
                        self.style, self.dtype, name=f"block{i}", **kw)(x)
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
    dcn: Any = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    gcb: Any = None
    stage_with_gcb: Sequence[bool] = (False, False, False, False)
    gen_attention: Any = None
    stage_with_gen_attention: Sequence[Sequence[int]] = ((), (), (), ())
    with_cp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block, stage_blocks = ARCH_SETTINGS[self.depth]
        # stem: 7×7/2 conv + BN + relu + 3×3/2 maxpool, lowered as a fused
        # block-4 space-to-depth pipeline (exact; see layers.StemBlock)
        x = StemBlock(dtype=self.dtype, name="stem")(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for i in range(self.num_stages):
            planes = 64 * 2 ** i
            x = ResLayerBlock(block, planes, stage_blocks[i],
                              self.strides[i], self.dilations[i], self.style,
                              self.dtype,
                              dcn=self.dcn if self.stage_with_dcn[i] else None,
                              gcb=self.gcb if self.stage_with_gcb[i] else None,
                              gen_attention=self.gen_attention,
                              gen_attention_blocks=tuple(
                                  self.stage_with_gen_attention[i]),
                              with_cp=self.with_cp,
                              name=f"layer{i + 1}")(x)
            if i + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
