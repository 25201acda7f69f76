"""Host-side data pipelines (numpy/cv2) — behaviourally matched to the
reference's mmdet pipelines (`/root/reference/mmdet/datasets/pipelines/`):
LoadImageFromFile/LoadAnnotations (loading.py:12,38), Resize keep-ratio,
RandomFlip, Pad, Normalize, PhotoMetricDistortion, Expand, MinIoURandomCrop
(transforms.py:15,171,240,293,430,519,595).  These run on CPU workers and
feed the static-canvas device batcher; no torch/mmcv dependency.

Randomness: np.random module state, like the reference (seeded per worker).
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = [build_transform(t) if isinstance(t, dict) else t
                           for t in transforms]

    def __call__(self, results: Dict) -> Optional[Dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


class LoadImageFromFile:
    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def __call__(self, results):
        filename = osp.join(results["img_prefix"], results["img_info"]["filename"])
        img = cv2.imread(filename, cv2.IMREAD_COLOR)  # BGR, like mmcv
        if img is None:
            raise FileNotFoundError(filename)
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = filename
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        return results


class LoadAnnotations:
    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, with_seg: bool = False):
        self.with_bbox = with_bbox
        self.with_label = with_label

    def __call__(self, results):
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"].copy()
            results.setdefault("bbox_fields", []).append("gt_bboxes")
            if ann.get("bboxes_ignore") is not None:
                results["gt_bboxes_ignore"] = ann["bboxes_ignore"].copy()
                results["bbox_fields"].append("gt_bboxes_ignore")
        if self.with_label:
            results["gt_labels"] = ann["labels"].copy()
        return results


def rescale_size(h: int, w: int, scale) -> float:
    """mmcv.imrescale scale factor: long edge ≤ max(scale), short ≤ min(scale)."""
    max_long, max_short = max(scale), min(scale)
    return min(max_long / max(h, w), max_short / min(h, w))


class Resize:
    def __init__(self, img_scale=(1000, 600), keep_ratio: bool = True,
                 multiscale_mode: str = "range", ratio_range=None):
        self.img_scale = img_scale
        self.keep_ratio = keep_ratio

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.keep_ratio:
            f = rescale_size(h, w, self.img_scale)
            new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
            img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
            w_scale = new_w / w
            h_scale = new_h / h
        else:
            new_w, new_h = self.img_scale
            img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
            w_scale = new_w / w
            h_scale = new_h / h
        results["img"] = img
        results["img_shape"] = img.shape
        results["pad_shape"] = img.shape
        scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
        results["scale_factor"] = scale_factor
        results["keep_ratio"] = self.keep_ratio
        for key in results.get("bbox_fields", []):
            bboxes = results[key] * scale_factor
            bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, img.shape[1] - 1)
            bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, img.shape[0] - 1)
            results[key] = bboxes
        return results


class RandomFlip:
    def __init__(self, flip_ratio: float = 0.0):
        self.flip_ratio = flip_ratio

    def __call__(self, results):
        if "flip" not in results:
            results["flip"] = np.random.rand() < self.flip_ratio
        if results["flip"]:
            results["img"] = np.ascontiguousarray(results["img"][:, ::-1, :])
            w = results["img_shape"][1]
            for key in results.get("bbox_fields", []):
                b = results[key].copy()
                b[..., 0::4] = w - results[key][..., 2::4] - 1
                b[..., 2::4] = w - results[key][..., 0::4] - 1
                results[key] = b
        return results


class Normalize:
    def __init__(self, mean, std, to_rgb: bool = False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results["img"] = (img - self.mean) / self.std
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


class Pad:
    def __init__(self, size=None, size_divisor: Optional[int] = None,
                 pad_val: float = 0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            ph, pw = self.size
        else:
            d = self.size_divisor
            ph, pw = -(-h // d) * d, -(-w // d) * d
        out = np.full((ph, pw, img.shape[2]), self.pad_val, img.dtype)
        out[:h, :w] = img
        results["img"] = out
        results["pad_shape"] = out.shape
        results["pad_fixed_size"] = self.size
        results["pad_size_divisor"] = self.size_divisor
        return results


class PhotoMetricDistortion:
    """transforms.py:430 — brightness/contrast/HSV jitter + channel swap."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        if np.random.randint(2):
            img = img + np.random.uniform(-self.brightness_delta,
                                          self.brightness_delta)
        mode = np.random.randint(2)
        if mode == 1 and np.random.randint(2):
            img = img * np.random.uniform(self.contrast_lower, self.contrast_upper)
        # BGR → HSV on float32 (cv2: H∈[0,360), S∈[0,1], V unbounded)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.float32) / 255.0,
                           cv2.COLOR_BGR2HSV)
        if np.random.randint(2):
            hsv[..., 1] *= np.random.uniform(self.saturation_lower,
                                             self.saturation_upper)
        if np.random.randint(2):
            hsv[..., 0] += np.random.uniform(-self.hue_delta, self.hue_delta)
            hsv[..., 0][hsv[..., 0] > 360] -= 360
            hsv[..., 0][hsv[..., 0] < 0] += 360
        hsv[..., 1] = np.clip(hsv[..., 1], 0, 1)
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR) * 255.0
        if mode == 0 and np.random.randint(2):
            img = img * np.random.uniform(self.contrast_lower, self.contrast_upper)
        if np.random.randint(2):
            img = img[..., np.random.permutation(3)]
        results["img"] = img
        return results


class Expand:
    """transforms.py:519 — paste onto a mean-filled larger canvas."""

    def __init__(self, mean=(0, 0, 0), to_rgb=False, ratio_range=(1, 4)):
        self.mean = mean if not to_rgb else mean[::-1]
        self.min_ratio, self.max_ratio = ratio_range

    def __call__(self, results):
        if np.random.randint(2):
            return results
        img = results["img"]
        h, w, c = img.shape
        ratio = np.random.uniform(self.min_ratio, self.max_ratio)
        expand = np.full((int(h * ratio), int(w * ratio), c),
                         self.mean, dtype=img.dtype)
        left = int(np.random.uniform(0, w * ratio - w))
        top = int(np.random.uniform(0, h * ratio - h))
        expand[top:top + h, left:left + w] = img
        results["img"] = expand
        results["img_shape"] = expand.shape
        if "gt_bboxes" in results:
            results["gt_bboxes"] = results["gt_bboxes"] + np.tile(
                (left, top), 2).astype(results["gt_bboxes"].dtype)
        return results


def _iou_patch(patch: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one patch vs boxes (mmdet uses its numpy bbox_overlaps)."""
    if boxes.shape[0] == 0:
        return np.zeros((0,), np.float32)
    lt = np.maximum(patch[:2], boxes[:, :2])
    rb = np.minimum(patch[2:], boxes[:, 2:4])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = (patch[2] - patch[0] + 1) * (patch[3] - patch[1] + 1)
    a2 = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    return inter / (a1 + a2 - inter)


class MinIoURandomCrop:
    """transforms.py:595 — SSD-style IoU-constrained random crop."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size

    def __call__(self, results):
        img = results["img"]
        boxes = results.get("gt_bboxes")
        labels = results.get("gt_labels")
        h, w, c = img.shape
        while True:
            mode = self.sample_mode[np.random.randint(len(self.sample_mode))]
            if mode == 1:
                return results
            min_iou = mode
            for _ in range(50):
                new_w = np.random.uniform(self.min_crop_size * w, w)
                new_h = np.random.uniform(self.min_crop_size * h, h)
                if new_h / new_w < 0.5 or new_h / new_w > 2:
                    continue
                left = np.random.uniform(w - new_w)
                top = np.random.uniform(h - new_h)
                patch = np.array([int(left), int(top),
                                  int(left + new_w), int(top + new_h)])
                if boxes is not None and boxes.shape[0] > 0:
                    overlaps = _iou_patch(patch.astype(np.float32), boxes)
                    if overlaps.min() < min_iou:
                        continue
                    centers = (boxes[:, :2] + boxes[:, 2:4]) / 2
                    m = ((centers[:, 0] > patch[0]) * (centers[:, 1] > patch[1])
                         * (centers[:, 0] < patch[2]) * (centers[:, 1] < patch[3]))
                    if not m.any():
                        continue
                    b = boxes[m].copy()
                    b[:, 2:4] = np.minimum(b[:, 2:4], patch[2:])
                    b[:, :2] = np.maximum(b[:, :2], patch[:2])
                    b -= np.tile(patch[:2], 2)
                    results["gt_bboxes"] = b
                    if labels is not None:
                        results["gt_labels"] = labels[m]
                img = img[patch[1]:patch[3], patch[0]:patch[2]]
                results["img"] = img
                results["img_shape"] = img.shape
                return results


class Corrupt:
    """transforms.py:684 — image corruption transform.

    The reference uses the `imagecorruptions` package (absent in this image);
    this implementation delegates to the in-repo numpy/cv2 corruption suite
    (tools/test_robustness.py) covering the noise/blur/weather/digital
    families used by the robustness benchmark."""

    def __init__(self, corruption: str, severity: int = 1):
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        import importlib
        import os.path as _osp
        import sys as _sys
        root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
        if root not in _sys.path:
            _sys.path.insert(0, root)
        corrupt = importlib.import_module("tools.test_robustness").corrupt
        img = results["img"]
        out = corrupt(np.clip(img, 0, 255).astype(np.uint8),
                      self.corruption, self.severity)
        results["img"] = out.astype(img.dtype)
        return results


class LoadProposals:
    """loading.py:131 — attach precomputed proposals to the sample."""

    def __init__(self, num_max_proposals: Optional[int] = None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results):
        proposals = results.get("proposals")
        if proposals is None:
            return results
        if proposals.shape[1] not in (4, 5):
            raise AssertionError(
                f"proposals should be (n, 4|5), got {proposals.shape}")
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[:self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.array([[0, 0, 0, 0]], np.float32)
        results["proposals"] = proposals
        results.setdefault("bbox_fields", []).append("proposals")
        return results


class MultiScaleFlipAug:
    """test_aug.py:8 — expand one sample into scale×flip augmented copies.

    Returns a LIST of results dicts (one per aug); consumers iterate and
    merge with `core.merge_augs`.
    """

    def __init__(self, transforms, img_scale, flip: bool = False):
        self.transforms = Compose(transforms)
        self.img_scales = (img_scale if isinstance(img_scale, list)
                           else [img_scale])
        self.flip = flip

    def __call__(self, results):
        augs = []
        flips = [False, True] if self.flip else [False]
        for scale in self.img_scales:
            for flip in flips:
                r = dict(results)
                r["img"] = results["img"].copy()
                r["scale_override"] = tuple(scale)
                r["flip"] = flip
                # rebuild Resize with this scale
                out = r
                for t in self.transforms.transforms:
                    if isinstance(t, Resize):
                        t = Resize(img_scale=tuple(scale),
                                   keep_ratio=t.keep_ratio)
                    out = t(out)
                    if out is None:
                        break
                if out is not None:
                    augs.append(out)
        return augs


class Albu:
    """transforms.py:705-817 — albumentations bridge.

    The external package is absent in this image, so the transforms run on
    the in-repo mini backend (`albu_mini.py`: flips, ShiftScaleRotate,
    RandomBrightnessContrast, ChannelShuffle, Blur/MedianBlur, GaussNoise,
    HueSaturationValue, RandomRotate90, OneOf) with the same per-transform
    probability gates, pascal_voc bbox handling, min_visibility filtering
    and `filter_lost_elements` label bookkeeping."""

    def __init__(self, transforms, bbox_params=None, keymap=None,
                 update_pad_shape=False, skip_img_without_anno=False):
        from .albu_mini import AlbuCompose
        self.filter_lost_elements = False
        self.update_pad_shape = update_pad_shape
        self.skip_img_without_anno = skip_img_without_anno
        bbox_params = dict(bbox_params) if bbox_params else None
        if (isinstance(bbox_params, dict) and "label_fields" in bbox_params
                and "filter_lost_elements" in bbox_params):
            self.filter_lost_elements = True
            self.origin_label_fields = list(bbox_params["label_fields"])
            bbox_params = dict(bbox_params, label_fields=["idx_mapper"])
            del bbox_params["filter_lost_elements"]
        self.aug = AlbuCompose(transforms, bbox_params)
        self.keymap_to_albu = keymap or {"img": "image",
                                         "gt_bboxes": "bboxes"}
        self.keymap_back = {v: k for k, v in self.keymap_to_albu.items()}

    @staticmethod
    def mapper(d, keymap):
        return {keymap.get(k, k): v for k, v in d.items()}

    def __call__(self, results):
        data = self.mapper(results, self.keymap_to_albu)
        had_boxes = "bboxes" in data
        if self.filter_lost_elements and had_boxes:
            data["idx_mapper"] = np.arange(len(data["bboxes"]))
        kw = {k: data[k] for k in
              ("image", "bboxes", "idx_mapper")
              if k in data}
        # label_fields move in lockstep with bboxes (the reference hands the
        # whole results dict to albumentations; transforms.py:790+)
        for f in self.aug.label_fields:
            if f in data and f not in kw:
                kw[f] = data[f]
        out = self.aug(**kw)
        data.update(out)
        if self.filter_lost_elements and had_boxes:
            idx = np.asarray(data.pop("idx_mapper"), int)
            for f in self.origin_label_fields:
                data[f] = np.asarray(data[f])[idx]
            if not len(data["bboxes"]) and self.skip_img_without_anno:
                return None
        if had_boxes:
            data["bboxes"] = np.asarray(data["bboxes"],
                                        np.float32).reshape(-1, 4)
        results = self.mapper(data, self.keymap_back)
        results["img_shape"] = results["img"].shape
        if self.update_pad_shape:
            results["pad_shape"] = results["img"].shape
        return results


class ImageToTensor:
    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        return results  # arrays stay numpy on the host path


class DefaultFormatBundle:
    def __call__(self, results):
        return results


class Collect:
    def __init__(self, keys, meta_keys=("filename", "ori_shape", "img_shape",
                                        "pad_shape", "scale_factor", "flip",
                                        "img_norm_cfg")):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data = {k: results[k] for k in self.keys if k in results}
        data["img_meta"] = {k: results.get(k) for k in self.meta_keys}
        return data


TRANSFORMS = {
    "LoadImageFromFile": LoadImageFromFile,
    "LoadAnnotations": LoadAnnotations,
    "Resize": Resize,
    "RandomFlip": RandomFlip,
    "Normalize": Normalize,
    "Pad": Pad,
    "PhotoMetricDistortion": PhotoMetricDistortion,
    "Expand": Expand,
    "MinIoURandomCrop": MinIoURandomCrop,
    "Corrupt": Corrupt,
    "LoadProposals": LoadProposals,
    "MultiScaleFlipAug": MultiScaleFlipAug,
    "Albu": Albu,
    "ImageToTensor": ImageToTensor,
    "DefaultFormatBundle": DefaultFormatBundle,
    "Collect": Collect,
}


def build_transform(cfg: Dict):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if t not in TRANSFORMS:
        raise KeyError(f"unknown transform {t}")
    return TRANSFORMS[t](**cfg)
