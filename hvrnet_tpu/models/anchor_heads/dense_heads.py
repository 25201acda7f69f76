"""Single-stage dense heads (reference `mmdet/models/anchor_heads/`):
RetinaHead (retina_head.py), SSDHead (ssd_head.py), FCOSHead (fcos_head.py),
FoveaHead (fovea_head.py) — NHWC flax modules producing per-level
cls/reg maps.  Registered for model-zoo parity; the HVRNet critical path
uses only RPNHead.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import Conv, normal_init
from ..registry import HEADS


def _bias_prior(prior_prob: float = 0.01):
    b = -float(np.log((1 - prior_prob) / prior_prob))
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, b, dtype)


@HEADS.register_module
class RetinaHead(nn.Module):
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (1., 1., 1., 1.)
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @property
    def num_anchors(self):
        return self.scales_per_octave * len(self.anchor_ratios)

    @property
    def cls_out_channels(self):
        return self.num_classes - 1   # sigmoid focal loss

    @nn.compact
    def __call__(self, feats):
        init = normal_init(0.01)
        outs_cls, outs_reg = [], []
        cls_convs = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = Conv(self.num_anchors * self.cls_out_channels, (3, 3),
                          padding=1, dtype=self.dtype, kernel_init=init,
                          bias_init=_bias_prior(), name="retina_cls")
        retina_reg = Conv(self.num_anchors * 4, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name="retina_reg")
        for feat in feats:
            c = r = feat
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            outs_cls.append(retina_cls(c))
            outs_reg.append(retina_reg(r))
        return tuple(outs_cls), tuple(outs_reg)


@HEADS.register_module
class FreeAnchorRetinaHead(RetinaHead):
    """free_anchor_retina_head.py — same network; the free-anchor matching
    objective belongs to the (zoo, non-critical) training path."""


@HEADS.register_module
class GARetinaHead(RetinaHead):
    """ga_retina_head.py parity stub: plain retina network (guided-anchoring
    mask branch pending — requires MaskedConv, see ops/masked_conv)."""


@HEADS.register_module
class SSDHead(nn.Module):
    """ssd_head.py — per-level conv cls/reg with softmax classes."""
    num_classes: int = 81
    in_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 100, 300)
    basesize_ratio_range: Tuple[float, float] = (0.1, 0.9)
    anchor_ratios: Sequence[Sequence[int]] = ([2], [2, 3], [2, 3], [2, 3], [2], [2])
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs_cls, outs_reg = [], []
        for i, feat in enumerate(feats):
            ratios = self.anchor_ratios[i]
            num_anchors = 2 + 2 * len(ratios)
            outs_cls.append(Conv(num_anchors * self.num_classes, (3, 3),
                                 padding=1, dtype=self.dtype,
                                 name=f"cls_conv{i}")(feat))
            outs_reg.append(Conv(num_anchors * 4, (3, 3), padding=1,
                                 dtype=self.dtype, name=f"reg_conv{i}")(feat))
        return tuple(outs_cls), tuple(outs_reg)


class Scale(nn.Module):
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", lambda k, sh: jnp.full(sh, self.init_value),
                       ())
        return x * s


@HEADS.register_module
class FCOSHead(nn.Module):
    """fcos_head.py — anchor-free per-pixel cls + distance reg + centerness;
    GroupNorm towers, per-level learnable scale on the regression."""
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (1., 1., 1., 1.)
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = normal_init(0.01)
        cls_tower = [(Conv(self.feat_channels, (3, 3), padding=1,
                           dtype=self.dtype, kernel_init=init,
                           name=f"cls_conv{i}"),
                      nn.GroupNorm(num_groups=min(32, self.feat_channels), name=f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_tower = [(Conv(self.feat_channels, (3, 3), padding=1,
                           dtype=self.dtype, kernel_init=init,
                           name=f"reg_conv{i}"),
                      nn.GroupNorm(num_groups=min(32, self.feat_channels), name=f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        fcos_cls = Conv(self.num_classes - 1, (3, 3), padding=1,
                        dtype=self.dtype, kernel_init=init,
                        bias_init=_bias_prior(), name="fcos_cls")
        fcos_reg = Conv(4, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=init, name="fcos_reg")
        fcos_ctr = Conv(1, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=init, name="fcos_centerness")
        scales = [Scale(1.0, name=f"scale{i}") for i in range(len(self.strides))]

        cls_outs, reg_outs, ctr_outs = [], [], []
        for lvl, feat in enumerate(feats):
            c = r = feat
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            cls_outs.append(fcos_cls(c))
            ctr_outs.append(fcos_ctr(c))
            reg_outs.append(jnp.exp(scales[lvl](fcos_reg(r))))
        return tuple(cls_outs), tuple(reg_outs), tuple(ctr_outs)


@HEADS.register_module
class FoveaHead(FCOSHead):
    """fovea_head.py parity: same tower topology (fovea target assignment is
    a training-path variant)."""
