"""RoI extractor — dispatches RoIAlign/RoIPool over feature maps.

Reference `/root/reference/mmdet/models/roi_extractors/single_level.py:54-107`.
The two shipped configs use a single level (featmap_strides=[16]) with
RoIAlign(out 7, sample 2) and `feat_from_shared_head=True`, so the FPN
scale-mapping branch reduces to a single call; the multi-level mapping
(`map_roi_levels`) is kept for parity with FPN-based zoo models.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..ops.roi_align import roi_align
from ..ops.roi_pool import roi_pool
from ..utils.registry import Registry

ROI_EXTRACTORS = Registry("roi_extractor_impl")


class SingleRoIExtractor:
    def __init__(self, roi_layer: dict, out_channels: int,
                 featmap_strides: Sequence[int],
                 feat_from_shared_head: bool = False,
                 finest_scale: int = 56):
        self.roi_layer_cfg = dict(roi_layer)
        self.layer_type = self.roi_layer_cfg.pop("type", "RoIAlign")
        self.out_channels = out_channels
        self.featmap_strides = list(featmap_strides)
        self.feat_from_shared_head = feat_from_shared_head
        self.finest_scale = finest_scale

    @property
    def num_inputs(self) -> int:
        return len(self.featmap_strides)

    def map_roi_levels(self, rois: jnp.ndarray, num_levels: int) -> jnp.ndarray:
        """single_level.py:54-73 — assign rois to FPN levels by scale."""
        scale = jnp.sqrt((rois[:, 3] - rois[:, 1] + 1)
                         * (rois[:, 4] - rois[:, 2] + 1))
        target = jnp.floor(jnp.log2(scale / self.finest_scale + 1e-6))
        return jnp.clip(target, 0, num_levels - 1).astype(jnp.int32)

    def _pool(self, feat: jnp.ndarray, rois: jnp.ndarray, stride: int):
        out_size = int(self.roi_layer_cfg.get("out_size", 7))
        if self.layer_type == "RoIAlign":
            return roi_align(feat, rois, out_size=out_size,
                             spatial_scale=1.0 / stride,
                             sample_num=int(self.roi_layer_cfg.get("sample_num", 2)))
        if self.layer_type == "RoIPool":
            return roi_pool(feat, rois, out_size=out_size,
                            spatial_scale=1.0 / stride)
        raise ValueError(f"unknown roi layer {self.layer_type}")

    def __call__(self, feats, rois: jnp.ndarray) -> jnp.ndarray:
        """feats: list of (B, H, W, C) NHWC maps; rois: (R, 5)."""
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        num_levels = min(len(feats), self.num_inputs)
        if num_levels == 1:
            return self._pool(feats[0], rois, self.featmap_strides[0])
        levels = self.map_roi_levels(rois, num_levels)
        out = None
        for lvl in range(num_levels):
            pooled = self._pool(feats[lvl], rois, self.featmap_strides[lvl])
            sel = (levels == lvl)[:, None, None, None].astype(pooled.dtype)
            out = pooled * sel if out is None else out + pooled * sel
        return out
