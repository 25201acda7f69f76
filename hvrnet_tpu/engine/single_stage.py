"""Single-stage detector engines (reference `mmdet/models/detectors/
single_stage.py`, `retinanet.py`, `fcos.py`, `fovea.py`,
`reppoints_detector.py`, `rpn.py`).

Zoo-parity engines: backbone (+FPN) → dense head → per-level static top-k +
decode + multiclass NMS, all fixed-shape.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.builder import build_model_module
from ..models.registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..models.two_stage import build_submodule
from ..ops.anchors import AnchorGenerator
from ..ops.boxes import delta2bbox
from ..ops.nms import multiclass_nms_static
from ..utils.config import unwrap
import numpy as np


class SingleStageModule(nn.Module):
    backbone: Dict[str, Any]
    bbox_head: Dict[str, Any]
    neck: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_m = build_submodule(self.backbone, BACKBONES, self.dtype,
                                          "backbone")
        if self.neck is not None:
            self.neck_m = build_submodule(self.neck, NECKS, self.dtype, "neck")
        self.bbox_head_m = build_submodule(self.bbox_head, HEADS, self.dtype,
                                           "bbox_head")

    def extract_feat(self, img):
        feats = self.backbone_m(img.astype(self.dtype))
        if self.neck is not None:
            feats = self.neck_m(feats)
        return feats

    def __call__(self, img):
        feats = self.extract_feat(img)
        return self.bbox_head_m(feats)


class SingleStageEngine:
    def __init__(self, model_cfg, train_cfg=None, test_cfg=None,
                 dtype=jnp.float32):
        model_cfg = unwrap(model_cfg)
        self.model_cfg = model_cfg
        self.train_cfg = unwrap(train_cfg) if train_cfg else None
        self.test_cfg = unwrap(test_cfg) if test_cfg else None
        self.dtype = dtype
        self.module = SingleStageModule(
            backbone=model_cfg["backbone"],
            bbox_head=model_cfg["bbox_head"],
            neck=model_cfg.get("neck"),
            dtype=dtype)
        bh = model_cfg["bbox_head"]
        self.num_classes = int(bh.get("num_classes", 81))
        self.target_means = tuple(bh.get("target_means", (0., 0., 0., 0.)))
        self.target_stds = tuple(bh.get("target_stds", (1., 1., 1., 1.)))

    def init_params(self, rng, canvas_hw=(128, 128)):
        img = jnp.zeros((1, canvas_hw[0], canvas_hw[1], 3), jnp.float32)
        return self.module.init(rng, img)

    def _level_anchors(self, head_cfg, feat_hw, stride):
        ratios = tuple(head_cfg.get("anchor_ratios", (0.5, 1.0, 2.0)))
        octave = int(head_cfg.get("octave_base_scale", 4))
        spo = int(head_cfg.get("scales_per_octave", 3))
        scales = tuple(octave * 2 ** (i / spo) for i in range(spo))
        gen = AnchorGenerator(stride, scales, ratios)
        return jnp.asarray(gen.grid_anchors(feat_hw, stride))

    @functools.lru_cache(maxsize=8)
    def _simple_test_fn(self, canvas_h: int, canvas_w: int):
        mod = self.module
        cfg = self.test_cfg or dict(score_thr=0.05,
                                    nms=dict(type="nms", iou_thr=0.5),
                                    max_per_img=100, nms_pre=1000)
        head_cfg = self.model_cfg["bbox_head"]
        head_type = str(head_cfg.get("type", ""))
        if head_type in ("FCOSHead", "FoveaHead", "RepPointsHead"):
            return self._point_test_fn(cfg, head_cfg, head_type)
        if head_type == "SSDHead":
            return self._ssd_test_fn(cfg, head_cfg)
        strides = tuple(head_cfg.get("anchor_strides",
                                     (8, 16, 32, 64, 128)))

        def fn(params, img, img_shape, scale_factor):
            out = mod.apply(params, img)
            if len(out) == 4:      # guided-anchoring heads (ga_retina_head)
                cls_maps, reg_maps, shape_maps, loc_maps = out
            else:
                cls_maps, reg_maps = out
                shape_maps = loc_maps = None
            all_boxes, all_scores = [], []
            fg = self.num_classes - 1
            for lvl, (cm, rm) in enumerate(zip(cls_maps, reg_maps)):
                feat_hw = cm.shape[1:3]
                if shape_maps is None:
                    anchors = self._level_anchors_cached(feat_hw, strides[lvl])
                else:
                    anchors, keep = self._guided_anchors(
                        head_cfg, feat_hw, strides[lvl],
                        shape_maps[lvl][0], loc_maps[lvl][0])
                scores = jax.nn.sigmoid(
                    cm[0].reshape(-1, fg).astype(jnp.float32))
                if shape_maps is not None:
                    # loc-filter (get_guided_anchors_single:326-363): the
                    # reference drops these anchors; zeroed scores die at
                    # score_thr, which is equivalent.
                    scores = scores * keep[:, None]
                deltas = rm[0].reshape(-1, 4).astype(jnp.float32)
                nms_pre = int(cfg.get("nms_pre", -1))   # reference default: disabled
                if 0 < nms_pre < scores.shape[0]:
                    top, idx = jax.lax.top_k(scores.max(axis=1), nms_pre)
                    scores = scores[idx]
                    deltas = deltas[idx]
                    anchors = anchors[idx]
                boxes = delta2bbox(anchors, deltas, self.target_means,
                                   self.target_stds, max_shape=img_shape)
                all_boxes.append(boxes)
                all_scores.append(scores)
            boxes = jnp.concatenate(all_boxes, axis=0) / jnp.asarray(
                scale_factor, jnp.float32)[:4].mean()
            scores = jnp.concatenate(all_scores, axis=0)
            # sigmoid heads have no bg column: prepend zeros (anchor_head.py:323-326)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1), scores.dtype), scores], axis=1)
            return multiclass_nms_static(
                boxes, scores, float(cfg["score_thr"]),
                float(cfg["nms"]["iou_thr"]), int(cfg["max_per_img"]))

        return jax.jit(fn)

    def _ssd_test_fn(self, cfg, head_cfg):
        """SSD decode (reference ssd_head via anchor_head.get_bboxes with
        use_sigmoid_cls=False): softmax scores including the background
        column, SSD anchor scheme, no score-column prepend."""
        from ..ops.anchors import ssd_anchor_generators_from_cfg
        mod = self.module
        gens, strides = ssd_anchor_generators_from_cfg(head_cfg)
        nc = self.num_classes

        def fn(params, img, img_shape, scale_factor):
            cls_maps, reg_maps = mod.apply(params, img)
            all_boxes, all_scores = [], []
            for lvl, (cm, rm) in enumerate(zip(cls_maps, reg_maps)):
                anchors = jnp.asarray(gens[lvl].grid_anchors(
                    cm.shape[1:3], strides[lvl]))
                scores = jax.nn.softmax(
                    cm[0].reshape(-1, nc).astype(jnp.float32), axis=-1)
                deltas = rm[0].reshape(-1, 4).astype(jnp.float32)
                nms_pre = int(cfg.get("nms_pre", -1))   # reference default: disabled
                if 0 < nms_pre < scores.shape[0]:
                    # rank by best foreground score (anchor_head.py:329-334)
                    _, idx = jax.lax.top_k(scores[:, 1:].max(axis=1), nms_pre)
                    scores = scores[idx]
                    deltas = deltas[idx]
                    anchors = anchors[idx]
                boxes = delta2bbox(anchors, deltas, self.target_means,
                                   self.target_stds, max_shape=img_shape)
                all_boxes.append(boxes)
                all_scores.append(scores)
            boxes = jnp.concatenate(all_boxes, axis=0) / jnp.asarray(
                scale_factor, jnp.float32)[:4].mean()
            scores = jnp.concatenate(all_scores, axis=0)
            return multiclass_nms_static(
                boxes, scores, float(cfg["score_thr"]),
                float(cfg["nms"]["iou_thr"]), int(cfg["max_per_img"]))

        return jax.jit(fn)

    def _point_test_fn(self, cfg, head_cfg, head_type):
        """Anchor-free decode paths.

        FCOS (fcos_head.py get_bboxes_single): boxes = point ± exp'd
        distances, scores = sigmoid(cls) · sigmoid(centerness).
        Fovea (fovea_head.py:340-387): boxes = stride·(i+0.5) ∓
        base_len·exp(reg), plain sigmoid scores.
        RepPoints (reppoints_head.py:542-596): boxes =
        points2bbox(refine offsets)·stride + point, sigmoid scores.
        """
        mod = self.module
        if head_type == "RepPointsHead":
            strides = tuple(head_cfg.get("point_strides",
                                         (8, 16, 32, 64, 128)))
        else:
            strides = tuple(head_cfg.get("strides", (4, 8, 16, 32, 64)))
        base_lens = tuple(head_cfg.get("base_edge_list",
                                       (16, 32, 64, 128, 256)))
        rp_method = str(head_cfg.get("transform_method", "moment"))
        rp_mul = float(head_cfg.get("moment_mul", 0.01))
        fg = self.num_classes - 1

        def level_points(feat_hw, stride, half_px: bool):
            fh, fw = feat_hw
            if half_px:   # fovea: (i + 0.5) · stride
                xs = (np.arange(fw, dtype=np.float32) + 0.5) * stride
                ys = (np.arange(fh, dtype=np.float32) + 0.5) * stride
            else:         # fcos: i · stride + stride // 2
                xs = np.arange(fw, dtype=np.float32) * stride + stride // 2
                ys = np.arange(fh, dtype=np.float32) * stride + stride // 2
            xx, yy = np.meshgrid(xs, ys)
            return jnp.asarray(np.stack([xx.reshape(-1), yy.reshape(-1)], -1))

        def fn(params, img, img_shape, scale_factor):
            out = mod.apply(params, img)
            all_boxes, all_scores = [], []
            for lvl in range(len(out[0])):
                cm = out[0][lvl]
                rm = out[1][lvl]
                feat_hw = cm.shape[1:3]
                scores = jax.nn.sigmoid(
                    cm[0].reshape(-1, fg).astype(jnp.float32))
                if head_type != "RepPointsHead":
                    reg = rm[0].reshape(-1, 4).astype(jnp.float32)
                if head_type == "FCOSHead":
                    pts = level_points(feat_hw, strides[lvl], half_px=False)
                    ctr = jax.nn.sigmoid(
                        out[2][lvl][0].reshape(-1).astype(jnp.float32))
                    scores = scores * ctr[:, None]
                    d = reg * strides[lvl]
                    boxes = jnp.stack(
                        [pts[:, 0] - d[:, 0], pts[:, 1] - d[:, 1],
                         pts[:, 0] + d[:, 2], pts[:, 1] + d[:, 3]], axis=-1)
                elif head_type == "RepPointsHead":
                    from .train_reppoints import points2bbox
                    fh, fw = feat_hw
                    xs = np.arange(fw, dtype=np.float32) * strides[lvl]
                    ys = np.arange(fh, dtype=np.float32) * strides[lvl]
                    gx, gy = np.meshgrid(xs, ys)
                    pts = jnp.asarray(
                        np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
                    off = out[2][lvl][0].reshape(
                        fh * fw, -1, 2).astype(jnp.float32)
                    xy = jnp.stack([off[..., 1], off[..., 0]], -1)  # y-first
                    mt = (params["params"]["bbox_head"].get("moment_transfer")
                          if rp_method == "moment" else None)
                    b = points2bbox(
                        xy.reshape(fh * fw, -1), rp_method, mt, rp_mul)
                    boxes = b * strides[lvl] + jnp.concatenate(
                        [pts, pts], axis=1)
                else:
                    pts = level_points(feat_hw, strides[lvl], half_px=True)
                    d = jnp.exp(reg) * base_lens[lvl]
                    boxes = jnp.stack(
                        [pts[:, 0] - d[:, 0], pts[:, 1] - d[:, 1],
                         pts[:, 0] + d[:, 2], pts[:, 1] + d[:, 3]], axis=-1)
                boxes = jnp.clip(
                    boxes,
                    jnp.zeros(4, jnp.float32),
                    jnp.stack([img_shape[1] - 1, img_shape[0] - 1,
                               img_shape[1] - 1, img_shape[0] - 1]))
                nms_pre = int(cfg.get("nms_pre", -1))   # reference default: disabled
                if 0 < nms_pre < scores.shape[0]:
                    _, idx = jax.lax.top_k(scores.max(axis=1), nms_pre)
                    scores = scores[idx]
                    boxes = boxes[idx]
                all_boxes.append(boxes)
                all_scores.append(scores)
            boxes = jnp.concatenate(all_boxes, axis=0) / jnp.asarray(
                scale_factor, jnp.float32)[:4].mean()
            scores = jnp.concatenate(all_scores, axis=0)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1), scores.dtype), scores],
                axis=1)
            return multiclass_nms_static(
                boxes, scores, float(cfg["score_thr"]),
                float(cfg["nms"]["iou_thr"]), int(cfg["max_per_img"]))

        return jax.jit(fn)

    def _guided_anchors(self, head_cfg, feat_hw, stride, shape_map, loc_map):
        """Squares reshaped by the shape branch + loc-filter mask
        (guided_anchor_head.py:271-363)."""
        key = ("sq", feat_hw, stride)
        cache = getattr(self, "_anchor_cache", None)
        if cache is None:
            cache = self._anchor_cache = {}
        if key not in cache:
            octave = float(head_cfg.get("octave_base_scale", 8))
            gen = AnchorGenerator(stride, (octave,), (1.0,))
            cache[key] = jnp.asarray(gen.grid_anchors(feat_hw, stride))
        squares = cache[key]
        shape = shape_map.reshape(-1, 2).astype(jnp.float32)
        deltas = jnp.concatenate([jnp.zeros_like(shape), shape], axis=1)
        anchors = delta2bbox(
            squares, deltas,
            tuple(head_cfg.get("anchoring_means", (0., 0., 0., 0.))),
            tuple(head_cfg.get("anchoring_stds", (1., 1., 1., 1.))),
            wh_ratio_clip=1e-6)
        thr = float(head_cfg.get("loc_filter_thr", 0.01))
        keep = (jax.nn.sigmoid(loc_map.reshape(-1).astype(jnp.float32))
                >= thr).astype(jnp.float32)
        return anchors, keep

    def _level_anchors_cached(self, feat_hw, stride):
        key = (feat_hw, stride)
        cache = getattr(self, "_anchor_cache", None)
        if cache is None:
            cache = self._anchor_cache = {}
        if key not in cache:
            cache[key] = self._level_anchors(self.model_cfg["bbox_head"],
                                             feat_hw, stride)
        return cache[key]

    def simple_test(self, params, img, img_shape, scale_factor):
        fn = self._simple_test_fn(img.shape[1], img.shape[2])
        return fn(params, img, jnp.asarray(img_shape, jnp.float32),
                  jnp.asarray(scale_factor, jnp.float32))


@DETECTORS.register_module
class RetinaNet(SingleStageEngine):
    pass


@DETECTORS.register_module
class SingleStageDetector(SingleStageEngine):
    pass


@DETECTORS.register_module
class FCOS(SingleStageEngine):
    pass


@DETECTORS.register_module
class FOVEA(SingleStageEngine):
    pass


@DETECTORS.register_module
class RepPointsDetector(SingleStageEngine):
    pass


@DETECTORS.register_module
class RPN(SingleStageEngine):
    """Proposal-only detector (reference detectors/rpn.py)."""
