"""Static canvas management.

The reference pads each image to a ÷16 multiple of its own size
(`Pad(size_divisor=16)`), giving per-frame dynamic shapes.  XLA wants one
compiled program, so frames are padded onto a small set of static canvases
(landscape / portrait buckets for the (1000, 600) keep-ratio operating point,
`/root/reference/configs/faster_rcnn_r101_selsa_c5.py:170-181`).  Anchors for
a canvas are host-precomputed constants; per-frame anchor validity (the
reference's `valid_flags` over the true padded extent,
`anchor_generator.py:85-98` + `anchor_head.py:124-137`) becomes a dynamic
mask over the static grid.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.anchors import AnchorGenerator


class Canvas:
    """One static (H, W) image canvas and its anchor constants."""

    def __init__(self, height: int, width: int, stride: int = 16,
                 base_size: int = 16,
                 scales: Sequence[float] = (4, 8, 16, 32),
                 ratios: Sequence[float] = (0.5, 1.0, 2.0)):
        assert height % stride == 0 and width % stride == 0
        self.height = height
        self.width = width
        self.stride = stride
        self.feat_h = height // stride
        self.feat_w = width // stride
        gen = AnchorGenerator(base_size, scales, ratios)
        self.num_base_anchors = gen.num_base_anchors
        anchors_np = gen.grid_anchors((self.feat_h, self.feat_w), stride)
        self.anchors = jnp.asarray(anchors_np)
        a = gen.num_base_anchors
        idx = np.arange(anchors_np.shape[0])
        cell = idx // a
        self.cell_y = jnp.asarray((cell // self.feat_w).astype(np.int32))
        self.cell_x = jnp.asarray((cell % self.feat_w).astype(np.int32))

    def anchor_valid(self, pad_shape: jnp.ndarray) -> jnp.ndarray:
        """(A,) bool — anchors whose grid cell lies inside the true padded
        extent (valid_feat = ceil(pad/stride), anchor_head.py:131-132)."""
        vh = jnp.ceil(pad_shape[0] / self.stride).astype(jnp.int32)
        vw = jnp.ceil(pad_shape[1] / self.stride).astype(jnp.int32)
        vh = jnp.minimum(vh, self.feat_h)
        vw = jnp.minimum(vw, self.feat_w)
        return (self.cell_y < vh) & (self.cell_x < vw)


@lru_cache(maxsize=8)
def get_canvas(height: int, width: int, stride: int = 16,
               scales: Tuple[float, ...] = (4, 8, 16, 32),
               ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)) -> Canvas:
    return Canvas(height, width, stride, stride, scales, ratios)


def pick_canvas_shape(img_h: int, img_w: int, max_long: int = 1008,
                      max_short: int = 608, divisor: int = 16
                      ) -> Tuple[int, int]:
    """Bucket a resized frame into the landscape or portrait static canvas."""
    if img_w >= img_h:
        return (max_short, max_long)
    return (max_long, max_short)


def pad_to_canvas(img: np.ndarray, canvas_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad an (h, w, 3) image to the canvas (top-left aligned)."""
    h, w = img.shape[:2]
    ch, cw = canvas_hw
    assert h <= ch and w <= cw, (img.shape, canvas_hw)
    out = np.zeros((ch, cw, img.shape[2]), dtype=img.dtype)
    out[:h, :w] = img
    return out
