"""In-repo mini-albumentations backend for the `Albu` pipeline transform.

The reference bridges to the external albumentations package
(`/root/reference/mmdet/datasets/pipelines/transforms.py:705-817`), which is
not available in this image.  This module implements the transforms that
mmdet-era configs actually use (the canonical Albu example block: flips,
ShiftScaleRotate, RandomBrightnessContrast, ChannelShuffle, Blur/MedianBlur,
GaussNoise, HueSaturationValue, RandomRotate90, OneOf) with albumentations'
calling conventions: per-transform probability gates, pascal_voc absolute
bboxes, `min_visibility` filtering, and label bookkeeping for
`filter_lost_elements`.

Host-side numpy/cv2 code (augmentation is host work feeding the device
pipeline); randomness uses np.random like every other pipeline transform.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

ALBU_TRANSFORMS = {}


def register(cls):
    ALBU_TRANSFORMS[cls.__name__] = cls
    return cls


class _Transform:
    """Base: probability gate + independent image/bbox hooks."""

    def __init__(self, p: float = 0.5, **unused):
        self.p = float(p)

    # data: dict(image=..., bboxes=(n,4) float abs, labels=(n,))
    def __call__(self, data: Dict) -> Dict:
        if np.random.rand() < self.p:
            data = self.apply(data)
        return data

    def force(self, data: Dict) -> Dict:
        """Apply unconditionally (used by OneOf) — no shared-state mutation,
        safe when a pipeline is shared across loader threads."""
        return self.apply(data)

    def apply(self, data: Dict) -> Dict:
        raise NotImplementedError


@register
class HorizontalFlip(_Transform):
    def apply(self, data):
        img = data["image"]
        data["image"] = np.ascontiguousarray(img[:, ::-1])
        if len(data["bboxes"]):
            w = img.shape[1]
            b = data["bboxes"].copy()
            b[:, [0, 2]] = w - data["bboxes"][:, [2, 0]]
            data["bboxes"] = b
        return data


@register
class VerticalFlip(_Transform):
    def apply(self, data):
        img = data["image"]
        data["image"] = np.ascontiguousarray(img[::-1])
        if len(data["bboxes"]):
            h = img.shape[0]
            b = data["bboxes"].copy()
            b[:, [1, 3]] = h - data["bboxes"][:, [3, 1]]
            data["bboxes"] = b
        return data


@register
class RandomRotate90(_Transform):
    def apply(self, data):
        k = np.random.randint(0, 4)
        img = data["image"]
        h, w = img.shape[:2]
        data["image"] = np.ascontiguousarray(np.rot90(img, k))
        b = data["bboxes"]
        for _ in range(k):   # one CCW 90° rotation at a time
            if len(b):
                x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
                b = np.stack([y1, w - x2, y2, w - x1], axis=1)
            h, w = w, h
        data["bboxes"] = b
        return data


@register
class RandomBrightnessContrast(_Transform):
    def __init__(self, brightness_limit=0.2, contrast_limit=0.2,
                 brightness_by_max=True, p=0.5, **unused):
        super().__init__(p)
        self.brightness_limit = self._pair(brightness_limit)
        self.contrast_limit = self._pair(contrast_limit)
        self.brightness_by_max = brightness_by_max

    @staticmethod
    def _pair(v):
        return (-v, v) if np.isscalar(v) else (float(v[0]), float(v[1]))

    def apply(self, data):
        alpha = 1.0 + np.random.uniform(*self.contrast_limit)
        beta = np.random.uniform(*self.brightness_limit)
        img = data["image"].astype(np.float32)
        max_v = 255.0 if data["image"].dtype == np.uint8 else 1.0
        # albumentations: brightness shifts by beta*max (brightness_by_max)
        # or beta*mean otherwise
        shift = beta * (max_v if self.brightness_by_max else img.mean())
        out = img * alpha + shift
        if data["image"].dtype == np.uint8:
            out = np.clip(out, 0, 255).astype(np.uint8)
        data["image"] = out
        return data


@register
class ChannelShuffle(_Transform):
    def apply(self, data):
        perm = np.random.permutation(data["image"].shape[2])
        data["image"] = np.ascontiguousarray(data["image"][:, :, perm])
        return data


@register
class Blur(_Transform):
    def __init__(self, blur_limit=7, p=0.5, **unused):
        super().__init__(p)
        self.blur_limit = (3, blur_limit) if np.isscalar(blur_limit) \
            else tuple(blur_limit)

    def _ksize(self):
        lo, hi = self.blur_limit
        ks = np.random.randint(lo, hi + 1)
        return ks + 1 - ks % 2   # odd

    def apply(self, data):
        k = self._ksize()
        data["image"] = cv2.blur(data["image"], (k, k))
        return data


@register
class MedianBlur(Blur):
    def apply(self, data):
        img = data["image"]
        as_u8 = img.dtype != np.uint8
        if as_u8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        out = cv2.medianBlur(img, self._ksize())
        data["image"] = out.astype(data["image"].dtype) if as_u8 else out
        return data


@register
class GaussNoise(_Transform):
    def __init__(self, var_limit=(10.0, 50.0), mean=0.0, p=0.5, **unused):
        super().__init__(p)
        self.var_limit = (0, var_limit) if np.isscalar(var_limit) \
            else tuple(var_limit)
        self.mean = mean

    def apply(self, data):
        var = np.random.uniform(*self.var_limit)
        noise = np.random.normal(self.mean, var ** 0.5,
                                 data["image"].shape).astype(np.float32)
        img = data["image"].astype(np.float32) + noise
        if data["image"].dtype == np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        data["image"] = img
        return data


@register
class HueSaturationValue(_Transform):
    def __init__(self, hue_shift_limit=20, sat_shift_limit=30,
                 val_shift_limit=20, p=0.5, **unused):
        super().__init__(p)
        self.h = self._pair(hue_shift_limit)
        self.s = self._pair(sat_shift_limit)
        self.v = self._pair(val_shift_limit)

    @staticmethod
    def _pair(v):
        return (-v, v) if np.isscalar(v) else tuple(v)

    def apply(self, data):
        img = data["image"]
        as_f = img.dtype != np.uint8
        u8 = np.clip(img, 0, 255).astype(np.uint8) if as_f else img
        hsv = cv2.cvtColor(u8, cv2.COLOR_BGR2HSV).astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + round(np.random.uniform(*self.h))) % 180
        hsv[..., 1] = np.clip(hsv[..., 1] + round(np.random.uniform(*self.s)),
                              0, 255)
        hsv[..., 2] = np.clip(hsv[..., 2] + round(np.random.uniform(*self.v)),
                              0, 255)
        out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        data["image"] = out.astype(img.dtype) if as_f else out
        return data


@register
class ShiftScaleRotate(_Transform):
    def __init__(self, shift_limit=0.0625, scale_limit=0.1, rotate_limit=45,
                 interpolation=cv2.INTER_LINEAR,
                 border_mode=cv2.BORDER_REFLECT_101, p=0.5, **unused):
        super().__init__(p)
        self.shift = self._pair(shift_limit)
        self.scale = self._pair(scale_limit)
        self.rot = self._pair(rotate_limit)
        self.interpolation = interpolation
        self.border_mode = border_mode

    @staticmethod
    def _pair(v):
        return (-v, v) if np.isscalar(v) else tuple(v)

    def apply(self, data):
        img = data["image"]
        h, w = img.shape[:2]
        angle = np.random.uniform(*self.rot)
        scale = 1.0 + np.random.uniform(*self.scale)
        dx = np.random.uniform(*self.shift) * w
        dy = np.random.uniform(*self.shift) * h
        M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        M[0, 2] += dx
        M[1, 2] += dy
        data["image"] = cv2.warpAffine(
            img, M, (w, h), flags=self.interpolation,
            borderMode=self.border_mode)
        b = data["bboxes"]
        if len(b):
            # corner transform + axis-aligned envelope (albu bbox semantics)
            corners = np.stack([b[:, [0, 1]], b[:, [2, 1]],
                                b[:, [0, 3]], b[:, [2, 3]]], axis=1)  # (n,4,2)
            ones = np.ones((*corners.shape[:2], 1), np.float32)
            pts = np.concatenate([corners, ones], axis=2) @ M.T      # (n,4,2)
            data["bboxes"] = np.concatenate(
                [pts.min(axis=1), pts.max(axis=1)], axis=1).astype(np.float32)
        return data


@register
class OneOf:
    """Pick one member (weighted by member p) and run it with p=1."""

    def __init__(self, transforms: Sequence, p: float = 0.5, **unused):
        self.p = float(p)
        self.members = [build_albu(t) for t in transforms]
        ps = np.asarray([m.p for m in self.members], np.float64)
        self.weights = ps / ps.sum() if ps.sum() > 0 else None

    def __call__(self, data):
        if self.members and np.random.rand() < self.p:
            data = self.force(data)
        return data

    def force(self, data):
        if not self.members:
            return data
        idx = np.random.choice(len(self.members), p=self.weights)
        return self.members[idx].force(data)


def build_albu(cfg: Dict):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if t not in ALBU_TRANSFORMS:
        raise KeyError(f"albu_mini does not implement {t!r}; available: "
                       f"{sorted(ALBU_TRANSFORMS)}")
    return ALBU_TRANSFORMS[t](**cfg)


class AlbuCompose:
    """albumentations.Compose equivalent with pascal_voc bbox_params."""

    def __init__(self, transforms: Sequence[Dict],
                 bbox_params: Optional[Dict] = None):
        self.transforms = [build_albu(t) for t in transforms]
        bbox_params = dict(bbox_params or {})
        bbox_params.pop("type", None)
        fmt = bbox_params.get("format", "pascal_voc")
        assert fmt == "pascal_voc", f"only pascal_voc supported, got {fmt}"
        self.min_visibility = float(bbox_params.get("min_visibility", 0.0))
        self.label_fields: List[str] = list(bbox_params.get("label_fields", []))

    def __call__(self, **data):
        data.setdefault("bboxes", np.zeros((0, 4), np.float32))
        data["bboxes"] = np.asarray(data["bboxes"], np.float32).reshape(-1, 4)
        for t in self.transforms:
            data = t(data)
        # clip + visibility filter (albu BboxParams semantics: visibility is
        # the clipped area as a fraction of the TRANSFORMED pre-clip area, so
        # a uniformly shrunk but fully visible box has visibility 1)
        h, w = data["image"].shape[:2]
        b = data["bboxes"]
        if len(b):
            pre_clip = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))
            b = b.copy()
            b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
            b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            vis = np.where(pre_clip > 0, area / np.maximum(pre_clip, 1e-6), 0)
            keep = (area > 0) & (vis >= self.min_visibility)
            data["bboxes"] = b[keep]
            for f in self.label_fields:
                if f in data:
                    data[f] = np.asarray(data[f])[keep]
        return data
