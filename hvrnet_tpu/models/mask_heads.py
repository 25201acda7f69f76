"""Mask heads (reference `mmdet/models/mask_heads/`, 888 LoC total):
FCNMaskHead (fcn_mask_head.py), HTCMaskHead, FusedSemanticHead (semantic
branch), GridHead (grid_head.py), MaskIoUHead (maskiou_head.py).

NHWC flax modules + pure target/decode helpers with static shapes: masks are
predicted on the 28×28 RoI grid and pasted on the host at decode time.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.roi_align import roi_align
from .layers import Conv, dense
from .registry import HEADS


@HEADS.register_module
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    roi_feat_size: int = 14
    in_channels: int = 256
    conv_kernel_size: int = 3
    conv_out_channels: int = 256
    upsample_method: str = "deconv"
    upsample_ratio: int = 2
    num_classes: int = 81
    class_agnostic: bool = False
    loss_mask: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_feat: bool = False):
        """x: (R, 14, 14, C) → mask logits (R, 28, 28, num_classes-1);
        with return_feat also the post-conv features (HTC info flow)."""
        k = self.conv_kernel_size
        for i in range(self.num_convs):
            x = nn.relu(Conv(self.conv_out_channels, (k, k), padding=k // 2,
                             dtype=self.dtype, name=f"conv{i}")(x))
        res_feat = x
        if self.upsample_method == "deconv":
            x = nn.ConvTranspose(self.conv_out_channels,
                                 (self.upsample_ratio, self.upsample_ratio),
                                 strides=(self.upsample_ratio,) * 2,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="upsample")(x)
            x = nn.relu(x)
        elif self.upsample_method == "nearest":
            r = self.upsample_ratio
            B, H, W, C = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (B, H, r, W, r, C)).reshape(B, H * r, W * r, C)
        out_ch = 1 if self.class_agnostic else self.num_classes - 1
        logits = Conv(out_ch, (1, 1), dtype=self.dtype,
                      name="conv_logits")(x)
        return (logits, res_feat) if return_feat else logits


@HEADS.register_module
class HTCMaskHead(FCNMaskHead):
    """HTC variant (htc_mask_head.py:7-38): a 1×1 `conv_res` fuses the
    previous stage's post-conv features into the pooled input (mask info
    flow); `return_feat` exposes this stage's features for the next, and
    `return_logits=False` runs only the conv trunk (the flow-through mode
    used when replaying earlier heads)."""

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits: bool = True,
                 return_feat: bool = False):
        if res_feat is not None:
            x = x + nn.relu(Conv(self.conv_out_channels, (1, 1),
                                 dtype=self.dtype, name="conv_res")(res_feat))
        k = self.conv_kernel_size
        for i in range(self.num_convs):
            x = nn.relu(Conv(self.conv_out_channels, (k, k), padding=k // 2,
                             dtype=self.dtype, name=f"conv{i}")(x))
        res_feat = x
        if not return_logits:
            return res_feat
        if self.upsample_method == "deconv":
            x = nn.relu(nn.ConvTranspose(
                self.conv_out_channels,
                (self.upsample_ratio, self.upsample_ratio),
                strides=(self.upsample_ratio,) * 2, dtype=self.dtype,
                param_dtype=jnp.float32, name="upsample")(x))
        out_ch = 1 if self.class_agnostic else self.num_classes - 1
        logits = Conv(out_ch, (1, 1), dtype=self.dtype,
                      name="conv_logits")(x)
        return (logits, res_feat) if return_feat else logits


@HEADS.register_module
class FusedSemanticHead(nn.Module):
    """HTC semantic segmentation branch (fused_semantic_head.py)."""
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        target = feats[self.fusion_level]
        h, w = target.shape[1:3]
        fused = Conv(self.in_channels, (1, 1), dtype=self.dtype,
                     name="lateral_fuse")(target)
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            f = jax.image.resize(f, (f.shape[0], h, w, f.shape[3]), "bilinear")
            fused = fused + Conv(self.in_channels, (1, 1), dtype=self.dtype,
                                 name=f"lateral{i}")(f)
        x = fused
        for i in range(self.num_convs):
            x = nn.relu(Conv(self.conv_out_channels, (3, 3), padding=1,
                             dtype=self.dtype, name=f"conv{i}")(x))
        seg = Conv(self.num_classes, (1, 1), dtype=self.dtype,
                   name="conv_seg")(x)
        embedding = Conv(self.conv_out_channels, (1, 1), dtype=self.dtype,
                         name="conv_embedding")(x)
        return seg, embedding


@HEADS.register_module
class MaskIoUHead(nn.Module):
    """Mask Scoring R-CNN IoU head (maskiou_head.py)."""
    num_convs: int = 4
    num_fcs: int = 2
    roi_feat_size: int = 14
    in_channels: int = 257   # mask feat + pooled pred
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feat, mask_pred):
        """mask_feat: (R, 14, 14, C); mask_pred: (R, 28, 28, 1) sigmoided."""
        pooled_pred = nn.max_pool(mask_pred, (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feat, pooled_pred], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(Conv(self.conv_out_channels, (3, 3), (stride, stride),
                             padding=1, dtype=self.dtype, name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(dense(self.fc_out_channels, 0.01, self.dtype,
                              name=f"fc{i}")(x))
        return dense(self.num_classes - 1, 0.01, self.dtype,
                     name="fc_mask_iou")(x)


@HEADS.register_module
class GridHead(nn.Module):
    """Grid R-CNN head (grid_head.py): conv tower → deconv → grid-point
    heatmaps."""
    grid_points: int = 9
    num_convs: int = 8
    in_channels: int = 256
    conv_out_channels: int = 576
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.relu(nn.GroupNorm(num_groups=36, name=f"gn{i}")(
                Conv(self.conv_out_channels, (3, 3), padding=1,
                     dtype=self.dtype, name=f"conv{i}")(x)))
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name="deconv1")(x))
        x = nn.ConvTranspose(self.grid_points, (2, 2), strides=(2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="deconv2")(x)
        return x


# ---------------------------------------------------------------- targets
def mask_target(gt_masks: jnp.ndarray, rois: jnp.ndarray,
                mask_size: int = 28) -> jnp.ndarray:
    """Crop+resize GT masks to the RoI grid (reference mask_target.py) via
    RoIAlign on the binary mask raster.

    gt_masks: (R, H, W) per-sampled-roi full-image binary masks.
    rois: (R, 5) with batch column indexing into gt_masks' first axis.

    Note: the reference crops the inclusive pixel span then cv2-resizes;
    RoIAlign's (+1, half-pixel) sampling can differ in the outermost bin row/
    column (≤1/mask_size of the grid) — negligible for training targets.
    """
    masks = gt_masks[..., None].astype(jnp.float32)
    idx = jnp.arange(rois.shape[0], dtype=jnp.float32)[:, None]
    rois_local = jnp.concatenate([idx, rois[:, 1:5]], axis=1)
    out = roi_align(masks, rois_local, out_size=mask_size, spatial_scale=1.0,
                    sample_num=2)
    return (out[..., 0] >= 0.5).astype(jnp.float32)


def paste_masks_np(mask_pred: np.ndarray, dets: np.ndarray, labels: np.ndarray,
                   img_h: int, img_w: int, thr: float = 0.5) -> list:
    """Host-side decode: paste 28×28 sigmoided masks into image-size binary
    masks, grouped per class (reference fcn_mask_head.get_seg_masks)."""
    import cv2
    num_classes = mask_pred.shape[-1]
    segms = [[] for _ in range(num_classes)]
    for i in range(dets.shape[0]):
        x1, y1, x2, y2 = dets[i, :4]
        w = max(int(round(x2 - x1 + 1)), 1)
        h = max(int(round(y2 - y1 + 1)), 1)
        cls = int(labels[i])
        m = mask_pred[i, :, :, cls if num_classes > 1 else 0]
        m = cv2.resize(m.astype(np.float32), (w, h))
        full = np.zeros((img_h, img_w), np.uint8)
        x1i, y1i = int(round(x1)), int(round(y1))
        full[y1i:y1i + h, x1i:x1i + w] = (m >= thr).astype(np.uint8)[
            :max(min(h, img_h - y1i), 0), :max(min(w, img_w - x1i), 0)]
        segms[cls].append(full)
    return segms
