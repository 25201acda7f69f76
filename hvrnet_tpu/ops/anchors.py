"""Anchor generation — precomputed numpy constants, consumed as jnp arrays.

Matches `/root/reference/mmdet/core/anchor/anchor_generator.py:29-98` exactly
(including the round() of base anchors and the -1/+1 centre convention).
Anchors for a fixed canvas are compile-time constants, so generation happens
once on the host in numpy.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class AnchorGenerator:
    def __init__(self, base_size: float, scales: Sequence[float],
                 ratios: Sequence[float], scale_major: bool = True, ctr=None):
        self.base_size = base_size
        self.scales = np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.ctr = ctr
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self) -> int:
        return self.base_anchors.shape[0]

    def gen_base_anchors(self) -> np.ndarray:
        w = h = self.base_size
        if self.ctr is None:
            x_ctr = 0.5 * (w - 1)
            y_ctr = 0.5 * (h - 1)
        else:
            x_ctr, y_ctr = self.ctr
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        base = np.stack([
            x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)
        ], axis=-1)
        # torch.round rounds half-to-even; np.round matches.
        return np.round(base).astype(np.float32)

    def grid_anchors(self, featmap_size: Tuple[int, int], stride: int = 16) -> np.ndarray:
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0, feat_w, dtype=np.float32) * stride
        shift_y = np.arange(0, feat_h, dtype=np.float32) * stride
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        shifts = np.stack([xx, yy, xx, yy], axis=-1)
        all_anchors = self.base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 4).astype(np.float32)

    def reorder_base_anchors(self, indices: Sequence[int]):
        self.base_anchors = self.base_anchors[np.asarray(indices)]
        return self

    def valid_flags(self, featmap_size: Tuple[int, int],
                    valid_size: Tuple[int, int]) -> np.ndarray:
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        assert valid_h <= feat_h and valid_w <= feat_w
        valid_x = np.zeros(feat_w, bool)
        valid_y = np.zeros(feat_h, bool)
        valid_x[:valid_w] = True
        valid_y[:valid_h] = True
        valid = np.tile(valid_x, feat_h) & np.repeat(valid_y, feat_w)
        return np.repeat(valid, self.num_base_anchors)


def ssd_anchor_generators_from_cfg(head_cfg):
    """SSD anchor generators + strides straight from an SSDHead config dict —
    the single source for train- and test-time anchor schemes."""
    strides = tuple(head_cfg.get("anchor_strides", (8, 16, 32, 64, 100, 300)))
    gens = ssd_anchor_generators(
        input_size=int(head_cfg.get("input_size", 300)),
        num_levels=len(strides), anchor_strides=strides,
        basesize_ratio_range=tuple(head_cfg.get("basesize_ratio_range",
                                                (0.1, 0.9))),
        anchor_ratios=head_cfg.get(
            "anchor_ratios", ([2], [2, 3], [2, 3], [2, 3], [2], [2])))
    return gens, strides


def ssd_anchor_generators(input_size: int = 300,
                          num_levels: int = 6,
                          anchor_strides: Sequence[int] = (8, 16, 32, 64, 100, 300),
                          basesize_ratio_range: Tuple[float, float] = (0.1, 0.9),
                          anchor_ratios: Sequence[Sequence[float]] = (
                              [2], [2, 3], [2, 3], [2, 3], [2], [2])):
    """Per-level SSD anchor generators (reference `ssd_head.py:47-90`).

    Min/max sizes from the basesize ratio range (with the SSD300/512
    first-level special cases), per-level scales [1, sqrt(max/min)], ratios
    [1, 1/r, r, ...], scale_major=False, centre (stride-1)/2, and the base
    anchor reorder that inserts the scale-2 square at position 1.
    """
    min_ratio, max_ratio = basesize_ratio_range
    min_ratio = int(min_ratio * 100)
    max_ratio = int(max_ratio * 100)
    step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for r in range(int(min_ratio), int(max_ratio) + 1, step):
        min_sizes.append(int(input_size * r / 100))
        max_sizes.append(int(input_size * (r + step) / 100))
    if input_size == 300:
        if basesize_ratio_range[0] == 0.15:      # SSD300 COCO
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
        elif basesize_ratio_range[0] == 0.2:     # SSD300 VOC
            min_sizes.insert(0, int(input_size * 10 / 100))
            max_sizes.insert(0, int(input_size * 20 / 100))
    elif input_size == 512:
        if basesize_ratio_range[0] == 0.1:       # SSD512 COCO
            min_sizes.insert(0, int(input_size * 4 / 100))
            max_sizes.insert(0, int(input_size * 10 / 100))
        elif basesize_ratio_range[0] == 0.15:    # SSD512 VOC
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
    gens = []
    for k in range(num_levels):
        base_size = min_sizes[k]
        stride = anchor_strides[k]
        ctr = ((stride - 1) / 2.0, (stride - 1) / 2.0)
        scales = [1.0, np.sqrt(max_sizes[k] / min_sizes[k])]
        ratios = [1.0]
        for r in anchor_ratios[k]:
            ratios += [1.0 / r, r]
        gen = AnchorGenerator(base_size, scales, ratios, scale_major=False,
                              ctr=ctr)
        indices = list(range(len(ratios)))
        indices.insert(1, len(indices))
        gen.reorder_base_anchors(indices)
        gens.append(gen)
    return gens
