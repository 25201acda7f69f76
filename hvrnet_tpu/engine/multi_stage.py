"""Multi-stage / mask detector engines (reference `mmdet/models/detectors/`:
cascade_rcnn.py 514 LoC, htc.py 516, mask_rcnn.py, mask_scoring_rcnn.py 200,
grid_rcnn.py 229, double_head_rcnn.py 178).

Zoo engines on the two-stage plumbing: per-stage bbox heads with iterative
`regress_by_class` refinement at inference for Cascade/HTC, FCN mask branch
for the Mask R-CNN family.  Static shapes throughout (300-proposal sets with
validity masks).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.bbox_heads.bbox_head import get_det_bboxes
from ..models.builder import build_roi_extractor
from ..models.registry import BACKBONES, DETECTORS, HEADS, NECKS, SHARED_HEADS
from ..models.two_stage import build_submodule
from ..ops.boxes import delta2bbox
from ..utils.config import unwrap
from .detector import BaseEngine, _rpn_proposals


class MultiStageModule(nn.Module):
    backbone: Dict[str, Any]
    rpn_head: Dict[str, Any]
    bbox_head: Any                      # dict or list of per-stage dicts
    neck: Optional[Dict[str, Any]] = None
    shared_head: Optional[Dict[str, Any]] = None
    mask_head: Optional[Dict[str, Any]] = None
    semantic_head: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_m = build_submodule(self.backbone, BACKBONES,
                                          self.dtype, "backbone")
        if self.neck is not None:
            self.neck_m = build_submodule(self.neck, NECKS, self.dtype, "neck")
        if self.shared_head is not None:
            self.shared_head_m = build_submodule(self.shared_head,
                                                 SHARED_HEADS, self.dtype,
                                                 "shared_head")
        self.rpn_head_m = build_submodule(self.rpn_head, HEADS, self.dtype,
                                          "rpn_head")
        heads = (self.bbox_head if isinstance(self.bbox_head, (list, tuple))
                 else [self.bbox_head])
        self.bbox_heads_m = [build_submodule(h, HEADS, self.dtype,
                                             f"bbox_head{i}")
                             for i, h in enumerate(heads)]
        if self.mask_head is not None:
            if isinstance(self.mask_head, (list, tuple)):
                # per-stage mask heads (HTC): mask_head0, mask_head1, ...
                self.mask_heads_m = [
                    build_submodule(m, HEADS, self.dtype, f"mask_head{i}")
                    for i, m in enumerate(self.mask_head)]
            else:
                self.mask_head_m = build_submodule(self.mask_head, HEADS,
                                                   self.dtype, "mask_head")
        if self.semantic_head is not None:
            self.semantic_head_m = build_submodule(self.semantic_head, HEADS,
                                                   self.dtype, "semantic_head")

    def extract_feat(self, img):
        feats = self.backbone_m(img.astype(self.dtype))
        if self.neck is not None:
            feats = self.neck_m(feats)
        return feats

    def rpn(self, feat):
        return self.rpn_head_m(feat)

    def shared(self, feat):
        return self.shared_head_m(feat) if self.shared_head is not None else feat

    def bbox_stage(self, pooled, stage: int):
        return self.bbox_heads_m[stage](pooled)

    def mask(self, pooled):
        return self.mask_head_m(pooled)

    def mask_stage(self, pooled, stage: int, mask_info_flow: bool = True):
        """HTC per-stage mask forward with info flow (htc.py:97-104,
        142-150): replay heads 0..stage-1 trunk-only on THIS stage's pooled
        features to build last_feat, then run head `stage`."""
        last_feat = None
        if mask_info_flow:
            for j in range(stage):
                last_feat = self.mask_heads_m[j](
                    pooled, last_feat, return_logits=False)
        return self.mask_heads_m[stage](pooled, last_feat)

    def semantic(self, feats):
        """(seg logits, fused embedding) — htc.py:55-64 fusion source."""
        return self.semantic_head_m(feats)

    def __call__(self, img):
        feats = self.extract_feat(img)
        f0 = feats[0] if isinstance(feats, (list, tuple)) else feats
        rpn_out = self.rpn(f0)
        c5 = self.shared(f0)
        pooled = jnp.zeros((4, 7, 7, c5.shape[-1]), self.dtype)
        outs = [self.bbox_stage(pooled, i)
                for i in range(len(self.bbox_heads_m))]
        if self.mask_head is not None:
            mp = jnp.zeros((4, 14, 14, c5.shape[-1]), self.dtype)
            if isinstance(self.mask_head, (list, tuple)):
                for i in range(len(self.mask_head)):
                    self.mask_stage(mp, i)
            else:
                self.mask(mp)
        if self.semantic_head is not None and isinstance(feats, (list, tuple)):
            self.semantic_head_m(feats)
        return rpn_out, outs


class MultiStageEngine:
    num_stages: int = 1
    with_mask: bool = False

    def __init__(self, model_cfg, train_cfg=None, test_cfg=None,
                 dtype=jnp.float32):
        model_cfg = unwrap(model_cfg)
        self.model_cfg = model_cfg
        self.train_cfg = unwrap(train_cfg) if train_cfg else None
        self.test_cfg = unwrap(test_cfg) if test_cfg else None
        self.dtype = dtype
        self.module = MultiStageModule(
            backbone=model_cfg["backbone"],
            rpn_head=model_cfg["rpn_head"],
            bbox_head=model_cfg["bbox_head"],
            neck=model_cfg.get("neck"),
            shared_head=model_cfg.get("shared_head"),
            mask_head=model_cfg.get("mask_head"),
            semantic_head=model_cfg.get("semantic_head"),
            dtype=dtype)
        self.roi_extractor = build_roi_extractor(
            model_cfg["bbox_roi_extractor"])
        self.mask_roi_extractor = (
            build_roi_extractor(model_cfg["mask_roi_extractor"])
            if model_cfg.get("mask_roi_extractor") else self.roi_extractor)
        heads = (model_cfg["bbox_head"]
                 if isinstance(model_cfg["bbox_head"], (list, tuple))
                 else [model_cfg["bbox_head"]])
        self.num_stages = len(heads)
        self.head_cfgs = heads
        self.num_classes = int(heads[-1]["num_classes"])
        rh = model_cfg["rpn_head"]
        self.rpn_means = tuple(rh.get("target_means", (0., 0., 0., 0.)))
        self.rpn_stds = tuple(rh.get("target_stds", (1., 1., 1., 1.)))
        self.anchor_scales = tuple(rh.get("anchor_scales", (8,)))
        self.anchor_ratios = tuple(rh.get("anchor_ratios", (0.5, 1.0, 2.0)))
        self.anchor_stride = int(rh.get("anchor_strides", [16])[0])
        self.with_mask = model_cfg.get("mask_head") is not None
        mh = model_cfg.get("mask_head")
        self.num_mask_stages = (len(mh) if isinstance(mh, (list, tuple))
                                else (1 if mh else 0))
        self.with_semantic = model_cfg.get("semantic_head") is not None
        self.semantic_fusion = tuple(model_cfg.get("semantic_fusion",
                                                   ("bbox", "mask")))
        self.semantic_roi_extractor = (
            build_roi_extractor(model_cfg["semantic_roi_extractor"])
            if model_cfg.get("semantic_roi_extractor") else None)

    def init_params(self, rng, canvas_hw=(64, 64)):
        img = jnp.zeros((1, canvas_hw[0], canvas_hw[1], 3), jnp.float32)
        return self.module.init(rng, img)

    def _canvas(self, h, w):
        from .canvas import get_canvas
        return get_canvas(h, w, self.anchor_stride, self.anchor_scales,
                          self.anchor_ratios)

    def _fuse_semantic(self, pooled, emb, rois, branch):
        """Element-wise add of pooled semantic features (htc.py:55-64,
        86-94); the reference's adaptive_avg_pool2d resize is an integer-
        factor avg pool at the config operating points (14 → 7)."""
        if (emb is None or branch not in self.semantic_fusion
                or self.semantic_roi_extractor is None):
            return pooled
        sem = self.semantic_roi_extractor([emb], rois)
        if sem.shape[1:3] != pooled.shape[1:3]:
            fh = sem.shape[1] // pooled.shape[1]
            fw = sem.shape[2] // pooled.shape[2]
            sem = nn.avg_pool(sem, (fh, fw), (fh, fw))
        return pooled + sem.astype(pooled.dtype)

    @functools.lru_cache(maxsize=4)
    def _simple_test_fn(self, canvas_h: int, canvas_w: int):
        mod = self.module
        canvas = self._canvas(canvas_h, canvas_w)
        rpn_cfg = self.test_cfg["rpn"]
        rcnn_cfg = self.test_cfg.get("rcnn")

        def fn(params, img, img_shape, pad_shape, scale_factor):
            feats = mod.apply(params, img, method=mod.extract_feat)
            f0 = feats[0] if isinstance(feats, (list, tuple)) else feats
            cls_map, reg_map = mod.apply(params, f0, method=mod.rpn)
            c5 = mod.apply(params, f0, method=mod.shared)
            boxes, scores, mask = _rpn_proposals(
                cls_map[0], reg_map[0], canvas, pad_shape, img_shape, rpn_cfg,
                self.rpn_means, self.rpn_stds)
            emb = None
            if self.with_semantic and isinstance(feats, (list, tuple)):
                _, emb = mod.apply(params, feats, method=mod.semantic)
            ms_scores = []
            cur_boxes = boxes
            for stage in range(self.num_stages):
                rois = jnp.concatenate(
                    [jnp.zeros((cur_boxes.shape[0], 1), cur_boxes.dtype),
                     cur_boxes], axis=1)
                pooled = self.roi_extractor([c5], rois)
                pooled = self._fuse_semantic(pooled, emb, rois, "bbox")
                cls, reg = mod.apply(params, pooled, stage,
                                     method=mod.bbox_stage)
                ms_scores.append(jax.nn.softmax(cls, axis=-1))
                hc = self.head_cfgs[stage]
                if stage < self.num_stages - 1:
                    # refine by predicted class (bbox_head.regress_by_class)
                    label = jnp.argmax(cls[:, 1:], axis=1) + 1
                    if hc.get("reg_class_agnostic", False):
                        deltas = reg.reshape(-1, 4)
                    else:
                        deltas = jnp.take_along_axis(
                            reg.reshape(reg.shape[0], -1, 4),
                            label[:, None, None], axis=1)[:, 0]
                    cur_boxes = delta2bbox(
                        cur_boxes, deltas,
                        tuple(hc.get("target_means", (0., 0., 0., 0.))),
                        tuple(hc.get("target_stds", (0.1, 0.1, 0.2, 0.2))),
                        img_shape)
            # average stage scores (cascade_rcnn.py simple_test)
            mean_scores = sum(ms_scores) / len(ms_scores)
            hc = self.head_cfgs[-1]
            dets, labels, det_mask = get_det_bboxes(
                cur_boxes, jnp.log(jnp.clip(mean_scores, 1e-12, 1.0)), reg,
                img_shape, scale_factor,
                tuple(hc.get("target_means", (0., 0., 0., 0.))),
                tuple(hc.get("target_stds", (0.1, 0.1, 0.2, 0.2))),
                rescale=True, cfg=rcnn_cfg, valid=mask)
            if not self.with_mask:
                return dets, labels, det_mask
            mask_rois = jnp.concatenate(
                [jnp.zeros((dets.shape[0], 1)), dets[:, :4]
                 * jnp.asarray(scale_factor, jnp.float32)[:4].mean()], axis=1)
            mpooled = self.mask_roi_extractor([c5], mask_rois)
            mpooled = self._fuse_semantic(mpooled, emb, mask_rois, "mask")
            if self.num_mask_stages > 1:
                # per-stage preds averaged (htc.py:185-200 + merge_aug_masks)
                preds = [jax.nn.sigmoid(mod.apply(
                    params, mpooled, s, method=mod.mask_stage))
                    for s in range(self.num_mask_stages)]
                mask_pred = sum(preds) / len(preds)
            else:
                mask_pred = jax.nn.sigmoid(
                    mod.apply(params, mpooled, method=mod.mask))
            return dets, labels, det_mask, mask_pred

        return jax.jit(fn)

    def simple_test(self, params, img, img_shape, pad_shape, scale_factor):
        fn = self._simple_test_fn(img.shape[1], img.shape[2])
        return fn(params, img, jnp.asarray(img_shape, jnp.float32),
                  jnp.asarray(pad_shape, jnp.float32),
                  jnp.asarray(scale_factor, jnp.float32))


@DETECTORS.register_module
class CascadeRCNN(MultiStageEngine):
    pass


@DETECTORS.register_module
class HybridTaskCascade(MultiStageEngine):
    """HTC without the semantic-fusion training branch (registered as the
    reference's HTC detector type)."""


@DETECTORS.register_module
class MaskRCNN(MultiStageEngine):
    pass


@DETECTORS.register_module
class MaskScoringRCNN(MultiStageEngine):
    pass


@DETECTORS.register_module
class GridRCNN(MultiStageEngine):
    pass


@DETECTORS.register_module
class DoubleHeadRCNN(MultiStageEngine):
    pass
