"""Conv+FC bbox heads (reference `mmdet/models/bbox_heads/convfc_bbox_head.py`).

`SharedFCBBoxHead` is the config-selectable `net_type='FasterRCNN'` branch of
the reference HRNMP config (`faster_rcnn_r101_hrnmp_c5.py:31-32`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvBN, dense
from ..registry import HEADS
from .bbox_head import flatten_roi_feats


@HEADS.register_module
class ConvFCBBoxHead(nn.Module):
    num_shared_convs: int = 0
    num_shared_fcs: int = 0
    num_cls_convs: int = 0
    num_cls_fcs: int = 0
    num_reg_convs: int = 0
    num_reg_fcs: int = 0
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    with_avg_pool: bool = False
    with_cls: bool = True
    with_reg: bool = True
    roi_feat_size: int = 7
    in_channels: int = 256
    num_classes: int = 81
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *unused_args, **unused_kw):
        for i in range(self.num_shared_convs):
            x = ConvBN(self.conv_out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=f"shared_conv{i}")(x)
        if self.num_shared_fcs:
            if self.with_avg_pool and x.ndim == 4:
                x = x.mean(axis=(1, 2))
            x = flatten_roi_feats(x)
            for i in range(self.num_shared_fcs):
                x = nn.relu(dense(self.fc_out_channels, 0.01, self.dtype,
                                  name=f"shared_fc{i}")(x))
        x_cls = x_reg = x
        for i in range(self.num_cls_convs):
            x_cls = ConvBN(self.conv_out_channels, (3, 3), padding=1,
                           dtype=self.dtype, name=f"cls_conv{i}")(x_cls)
        if x_cls.ndim > 2:
            x_cls = flatten_roi_feats(x_cls)
        for i in range(self.num_cls_fcs):
            x_cls = nn.relu(dense(self.fc_out_channels, 0.01, self.dtype,
                                  name=f"cls_fc{i}")(x_cls))
        for i in range(self.num_reg_convs):
            x_reg = ConvBN(self.conv_out_channels, (3, 3), padding=1,
                           dtype=self.dtype, name=f"reg_conv{i}")(x_reg)
        if x_reg.ndim > 2:
            x_reg = flatten_roi_feats(x_reg)
        for i in range(self.num_reg_fcs):
            x_reg = nn.relu(dense(self.fc_out_channels, 0.01, self.dtype,
                                  name=f"reg_fc{i}")(x_reg))

        cls_score = (dense(self.num_classes, 0.01, self.dtype,
                           name="fc_cls")(x_cls) if self.with_cls else None)
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = (dense(out_dim, 0.001, self.dtype,
                           name="fc_reg")(x_reg) if self.with_reg else None)
        return cls_score, bbox_pred


@HEADS.register_module
class SharedFCBBoxHead(ConvFCBBoxHead):
    """2 shared fcs then cls/reg (reference convfc_bbox_head.py:166-185)."""
    num_shared_fcs: int = 2


@HEADS.register_module
class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN head (reference double_bbox_head.py): conv branch →
    reg, fc branch → cls."""
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    with_avg_pool: bool = True
    roi_feat_size: int = 7
    in_channels: int = 256
    num_classes: int = 81
    target_means: Sequence[float] = (0., 0., 0., 0.)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False
    loss_cls: Any = None
    loss_bbox: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *unused_args, **unused_kw):
        x_conv = x
        for i in range(self.num_convs):
            x_conv = ConvBN(self.conv_out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name=f"conv{i}")(x_conv)
        x_conv = x_conv.mean(axis=(1, 2))
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = dense(out_dim, 0.001, self.dtype, name="fc_reg")(x_conv)

        x_fc = flatten_roi_feats(x)
        for i in range(self.num_fcs):
            x_fc = nn.relu(dense(self.fc_out_channels, 0.01, self.dtype,
                                 name=f"fc{i}")(x_fc))
        cls_score = dense(self.num_classes, 0.01, self.dtype,
                          name="fc_cls")(x_fc)
        return cls_score, bbox_pred
