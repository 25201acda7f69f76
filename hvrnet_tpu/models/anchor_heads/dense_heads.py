"""Single-stage dense heads (reference `mmdet/models/anchor_heads/`):
RetinaHead (retina_head.py), SSDHead (ssd_head.py), FCOSHead (fcos_head.py),
FoveaHead (fovea_head.py) — NHWC flax modules producing per-level
cls/reg maps.  Registered for model-zoo parity; the HVRNet critical path
uses only RPNHead.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
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
class GARetinaHead(nn.Module):
    """Guided-Anchor RetinaNet head (reference ga_retina_head.py:11-120):
    stacked cls/reg towers, a location branch off the cls tower, a shape
    branch off the reg tower, per-branch feature adaption (1×1 offset conv on
    the detached shape pred → 3×3 deformable conv), then 3×3 cls/reg convs.

    The reference's MaskedConv2d loc-filter only skips computation at
    inference (mask=None during training); dense conv + downstream loc
    thresholding is the XLA-friendly equivalent, so the outputs match.
    """
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    octave_base_scale: int = 8
    scales_per_octave: int = 3
    octave_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    anchoring_means: Sequence[float] = (0., 0., 0., 0.)
    anchoring_stds: Sequence[float] = (1., 1., 1., 1.)
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (1., 1., 1., 1.)
    deformable_groups: int = 4
    loc_filter_thr: float = 0.01
    loss_loc: Any = None
    loss_shape: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @property
    def cls_out_channels(self):
        return self.num_classes - 1   # sigmoid focal loss

    @nn.compact
    def __call__(self, feats):
        from ...ops.deform import deform_conv2d
        init = normal_init(0.01)
        cls_convs = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        conv_loc = Conv(1, (1, 1), dtype=self.dtype, kernel_init=init,
                        bias_init=_bias_prior(), name="conv_loc")
        conv_shape = Conv(2, (1, 1), dtype=self.dtype, kernel_init=init,
                          name="conv_shape")
        adapt = {}
        for br in ("cls", "reg"):
            adapt[br] = (
                Conv(self.deformable_groups * 2 * 9, (1, 1), use_bias=False,
                     dtype=self.dtype, kernel_init=normal_init(0.1),
                     name=f"feature_adaption_{br}_offset"),
                self.param(f"feature_adaption_{br}_kernel", init,
                           (3, 3, self.feat_channels, self.feat_channels),
                           jnp.float32))
        retina_cls = Conv(self.cls_out_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          bias_init=_bias_prior(), name="retina_cls")
        retina_reg = Conv(4, (3, 3), padding=1, dtype=self.dtype,
                          kernel_init=init, name="retina_reg")
        outs = ([], [], [], [])
        for feat in feats:
            c = r = feat
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            loc = conv_loc(c)
            shape = conv_shape(r)
            sd = jax.lax.stop_gradient(shape)
            oc, kc = adapt["cls"]
            c = nn.relu(deform_conv2d(
                c, oc(sd), kc.astype(self.dtype), kernel_size=3, padding=1,
                deformable_groups=self.deformable_groups))
            orr, kr = adapt["reg"]
            r = nn.relu(deform_conv2d(
                r, orr(sd), kr.astype(self.dtype), kernel_size=3, padding=1,
                deformable_groups=self.deformable_groups))
            outs[0].append(retina_cls(c))
            outs[1].append(retina_reg(r))
            outs[2].append(shape)
            outs[3].append(loc)
        return tuple(tuple(o) for o in outs)


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
class FoveaHead(nn.Module):
    """fovea_head.py:44-170 — plain cls/reg conv towers, no centerness; the
    regression output stays in log space (exp'd at decode, log targets in
    the loss)."""
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    base_edge_list: Sequence[int] = (16, 32, 64, 128, 256)
    scale_ranges: Any = ((8, 32), (16, 64), (32, 128), (64, 256), (128, 512))
    sigma: float = 0.4
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = normal_init(0.01)
        cls_tower = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_tower = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        fovea_cls = Conv(self.num_classes - 1, (3, 3), padding=1,
                         dtype=self.dtype, kernel_init=init,
                         bias_init=_bias_prior(), name="fovea_cls")
        fovea_reg = Conv(4, (3, 3), padding=1, dtype=self.dtype,
                         kernel_init=init, name="fovea_reg")
        cls_outs, reg_outs = [], []
        for feat in feats:
            c = r = feat
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in reg_tower:
                r = nn.relu(conv(r))
            cls_outs.append(fovea_cls(c))
            reg_outs.append(fovea_reg(r))
        return tuple(cls_outs), tuple(reg_outs)


@HEADS.register_module
class RepPointsHead(nn.Module):
    """reppoints_head.py (596 LoC): point-set representation — cls tower +
    two-stage points prediction (init + refine via deformable conv over the
    predicted offsets)."""
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = "moment"
    moment_mul: float = 0.01
    loss_cls: Any = None
    loss_bbox_init: Any = None
    loss_bbox_refine: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ...ops.deform import deform_conv2d
        init = normal_init(0.01)
        k = int(np.sqrt(self.num_points))
        if self.transform_method == "moment":
            # learnable log half-extent scaling (reppoints_head.py:93-97);
            # consumed by points2bbox in the trainer / decode paths
            self.param("moment_transfer", nn.initializers.zeros, (2,),
                       jnp.float32)
        cls_convs = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        pts_convs = [Conv(self.feat_channels, (3, 3), padding=1,
                          dtype=self.dtype, kernel_init=init,
                          name=f"pts_conv{i}")
                     for i in range(self.stacked_convs)]
        pts_init_conv = Conv(self.point_feat_channels, (3, 3), padding=1,
                             dtype=self.dtype, kernel_init=init,
                             name="pts_init_conv")
        pts_init_out = Conv(2 * self.num_points, (1, 1), dtype=self.dtype,
                            kernel_init=init, name="pts_init_out")
        cls_dcn_w = self.param("cls_dcn_kernel", init,
                               (k, k, self.feat_channels,
                                self.point_feat_channels), jnp.float32)
        cls_out = Conv(self.num_classes - 1, (1, 1), dtype=self.dtype,
                       kernel_init=init, bias_init=_bias_prior(),
                       name="cls_out")
        pts_refine_w = self.param("pts_refine_kernel", init,
                                  (k, k, self.feat_channels,
                                   self.point_feat_channels), jnp.float32)
        pts_refine_out = Conv(2 * self.num_points, (1, 1), dtype=self.dtype,
                              kernel_init=init, name="pts_refine_out")

        cls_outs, init_outs, refine_outs = [], [], []
        for feat in feats:
            c = p = feat
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in pts_convs:
                p = nn.relu(conv(p))
            pts_init = pts_init_out(nn.relu(pts_init_conv(p)))
            # offsets for the deformable refine/cls convs come from the
            # init-stage points (gradient-detached like the reference)
            off = jax.lax.stop_gradient(pts_init)
            c_feat = nn.relu(deform_conv2d(c, off, cls_dcn_w,
                                           kernel_size=k, padding=k // 2))
            p_feat = nn.relu(deform_conv2d(p, off, pts_refine_w,
                                           kernel_size=k, padding=k // 2))
            cls_outs.append(cls_out(c_feat))
            init_outs.append(pts_init)
            refine_outs.append(pts_refine_out(p_feat) + off)
        return tuple(cls_outs), tuple(init_outs), tuple(refine_outs)


@HEADS.register_module
class GuidedAnchorHead(nn.Module):
    """guided_anchor_head.py: anchor location + shape branches and a
    feature-adaption deformable conv; the GA-RPN/GA-Retina heads build on
    this structure.

    Topology follows the reference exactly (`guided_anchor_head.py:18-60,
    172-208`): conv_loc/conv_shape are 1×1 on the input feature; the
    FeatureAdaption offset conv is a bias-free 1×1 over the DETACHED
    2-channel shape pred emitting `deformable_groups`·18 offsets into a 3×3
    grouped deformable conv; conv_cls/conv_reg are 1×1 on the adapted
    feature.  The reference's MaskedConv2d loc-filter only skips compute at
    inference (mask=None during training, `:201-205`); dense conv +
    downstream loc thresholding is the XLA-friendly equivalent (masked
    positions are never consumed), so the outputs match.
    """
    num_classes: int = 2
    in_channels: int = 256
    feat_channels: int = 256
    deformable_groups: int = 4
    dtype: Any = jnp.float32

    num_anchors: int = 1   # one (guided) anchor per location (ref:153)

    @nn.compact
    def __call__(self, feats):
        from ...ops.deform import deform_conv2d
        init = normal_init(0.01)
        loc_conv = Conv(1, (1, 1), dtype=self.dtype, kernel_init=init,
                        bias_init=_bias_prior(), name="conv_loc")
        shape_conv = Conv(self.num_anchors * 2, (1, 1), dtype=self.dtype,
                          kernel_init=init, name="conv_shape")
        offset_conv = Conv(self.deformable_groups * 2 * 9, (1, 1),
                           use_bias=False, dtype=self.dtype,
                           kernel_init=normal_init(0.1),
                           name="feature_adaption_offset")
        adapt_w = self.param("feature_adaption_kernel", init,
                             (3, 3, self.in_channels, self.feat_channels),
                             jnp.float32)
        cls_conv = Conv(self.num_anchors * (self.num_classes - 1), (1, 1),
                        dtype=self.dtype, kernel_init=init, name="conv_cls")
        reg_conv = Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                        kernel_init=init, name="conv_reg")
        loc_outs, shape_outs, cls_outs, reg_outs = [], [], [], []
        for feat in feats:
            loc = loc_conv(feat)
            shape = shape_conv(feat)
            off = offset_conv(jax.lax.stop_gradient(shape))
            adapted = nn.relu(deform_conv2d(
                feat, off, adapt_w.astype(self.dtype), kernel_size=3,
                padding=1, deformable_groups=self.deformable_groups))
            loc_outs.append(loc)
            shape_outs.append(shape)
            cls_outs.append(cls_conv(adapted))
            reg_outs.append(reg_conv(adapted))
        return tuple(cls_outs), tuple(reg_outs), tuple(shape_outs), tuple(loc_outs)


@HEADS.register_module
class GARPNHead(GuidedAnchorHead):
    """ga_rpn_head.py: guided-anchor RPN (binary objectness)."""
