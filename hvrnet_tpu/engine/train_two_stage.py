"""Still-image two-stage / multi-stage training steps.

Covers the zoo's Faster R-CNN, Mask R-CNN, and Cascade R-CNN training
semantics (reference `mmdet/models/detectors/two_stage.py:forward_train`,
`cascade_rcnn.py:forward_train`, `mask_rcnn.py` via `TwoStageDetector`):

  * RPN loss (sigmoid CE + smooth-L1 against anchor targets) on the image.
  * `train_cfg.rpn_proposal` proposals (no grad through the RPN maps).
  * Per-stage MaxIoU assignment → random sampling → bbox-head CE + smooth-L1;
    Cascade refines the sampled boxes by predicted class between stages
    (`bbox_head.regress_by_class`) with detached deltas and re-assigns at the
    next stage's (stricter) IoU thresholds, weighting stage losses by
    `train_cfg.stage_loss_weights` (reference default [1, 0.5, 0.25]).
  * Mask branch: 14×14 RoIAlign on the (positive-weighted) sampled RoIs →
    FCN mask head → per-class BCE vs GT masks cropped to the 28×28 grid
    (`fcn_mask_head.py:loss` + `mask_target.py`); fixed-shape with validity
    weighting instead of the reference's dynamic positive-only gather.

All shapes static: a fixed `sampler.num` RoI set per stage with validity /
positive masks, fixed GT slots.  One image per device per step (the
reference's imgs_per_gpu=1 operating point); scale out via the data mesh.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.targets import anchor_target_single, random_sample_and_target
from ..models.losses import accuracy, softmax_cross_entropy
from ..ops.boxes import delta2bbox
from .detector import _rpn_proposals
from .train import BaseTrainer, _rpn_loss, _smooth_l1
from .train_mask import mask_branch_loss


def _stage_cfgs(rcnn_cfg):
    return list(rcnn_cfg) if isinstance(rcnn_cfg, (list, tuple)) else [rcnn_cfg]


class TwoStageTrainer(BaseTrainer):
    """Training step for MultiStageEngine detectors (Faster/Mask/Cascade)."""

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        canvas = eng._canvas(canvas_h, canvas_w)
        tcfg = eng.train_cfg
        rpn_cfg = tcfg["rpn"]
        prop_cfg = tcfg["rpn_proposal"]
        stages = _stage_cfgs(tcfg["rcnn"])
        n_stages = eng.num_stages
        if len(stages) == 1 and n_stages > 1:
            stages = stages * n_stages
        loss_w = list(tcfg.get("stage_loss_weights", [1.0] * n_stages))
        with_mask = eng.with_mask
        # mask_size lives in train_cfg.rcnn (reference configs), agnosticism
        # in the mask_head cfg (take the last head for per-stage lists)
        mask_size = int(stages[-1].get("mask_size", 28))
        mh_cfg = eng.model_cfg.get("mask_head") or {}
        if isinstance(mh_cfg, (list, tuple)):
            mh_cfg = mh_cfg[-1]
        class_agnostic = bool(mh_cfg.get("class_agnostic", False))

        def loss_fn(params, sample, rng):
            img = sample["img"]
            if img.ndim == 3:
                img = img[None]
            rngs = jax.random.split(rng, n_stages + 1)
            feats = mod.apply(params, img, method=mod.extract_feat)
            f0 = feats[0] if isinstance(feats, (list, tuple)) else feats
            cls_map, reg_map = mod.apply(params, f0, method=mod.rpn)
            c5 = mod.apply(params, f0, method=mod.shared)

            # HTC semantic branch (htc.py:224-231 + fused_semantic_head.loss)
            emb = None
            loss_seg = None
            if getattr(eng, "with_semantic", False) and isinstance(
                    feats, (list, tuple)):
                seg, emb = mod.apply(params, feats, method=mod.semantic)
                if "gt_semantic_seg" in sample:
                    sem_cfg = eng.model_cfg.get("semantic_head") or {}
                    ignore = int(sem_cfg.get("ignore_label", 255))
                    lw_seg = float(sem_cfg.get("loss_weight", 0.2))
                    gt_seg = sample["gt_semantic_seg"].astype(jnp.int32)
                    logits = seg[0].astype(jnp.float32)
                    ce = softmax_cross_entropy(
                        logits.reshape(-1, logits.shape[-1]),
                        jnp.clip(gt_seg.reshape(-1), 0, None))
                    vmask = (gt_seg.reshape(-1) != ignore).astype(jnp.float32)
                    loss_seg = lw_seg * (ce * vmask).sum() / jnp.maximum(
                        vmask.sum(), 1.0)

            # --- RPN loss (rpn_head.loss via anchor_head.py:141-159)
            tgt = anchor_target_single(
                rngs[0], canvas.anchors,
                canvas.anchor_valid(sample["pad_shape"]),
                sample["gt_bboxes"], sample["gt_mask"], sample["img_shape"],
                rpn_cfg, eng.rpn_means, eng.rpn_stds)
            loss_rpn_cls, loss_rpn_bbox = _rpn_loss(cls_map[0], reg_map[0], tgt)
            total = loss_rpn_cls + loss_rpn_bbox
            logs = dict(loss_rpn_cls=loss_rpn_cls, loss_rpn_bbox=loss_rpn_bbox)

            boxes, _, pmask = _rpn_proposals(
                jax.lax.stop_gradient(cls_map[0]),
                jax.lax.stop_gradient(reg_map[0]),
                canvas, sample["pad_shape"], sample["img_shape"],
                prop_cfg, eng.rpn_means, eng.rpn_stds)

            last_sr = None
            last_pooled_rois = None
            for s in range(n_stages):
                scfg = stages[s]
                assigner = scfg["assigner"]
                samp = scfg["sampler"]
                samp = samp[0] if isinstance(samp, (list, tuple)) else samp
                hc = eng.head_cfgs[s]
                means = tuple(hc.get("target_means", (0., 0., 0., 0.)))
                stds = tuple(hc.get("target_stds", (0.1, 0.1, 0.2, 0.2)))
                sr = random_sample_and_target(
                    rngs[1 + s], boxes, pmask,
                    sample["gt_bboxes"], sample["gt_mask"],
                    sample["gt_labels"],
                    num=int(samp["num"]),
                    pos_fraction=float(samp["pos_fraction"]),
                    add_gt_as_proposals=bool(
                        samp.get("add_gt_as_proposals", True)),
                    pos_iou_thr=float(assigner["pos_iou_thr"]),
                    neg_iou_thr=float(assigner["neg_iou_thr"]),
                    min_pos_iou=float(assigner["min_pos_iou"]),
                    target_means=means, target_stds=stds,
                    pos_weight=float(scfg.get("pos_weight", -1)))
                rois = jnp.concatenate(
                    [jnp.zeros((sr.rois.shape[0], 1)), sr.rois], axis=1)
                pooled = eng.roi_extractor([c5], rois)
                pooled = eng._fuse_semantic(pooled, emb, rois, "bbox")
                cls, reg = mod.apply(params, pooled, s, method=mod.bbox_stage)
                navg = jnp.maximum((sr.label_weights > 0).sum().astype(
                    jnp.float32), 1.0)
                ce = softmax_cross_entropy(cls, sr.labels)
                lc = (ce * sr.label_weights).sum() / navg
                if hc.get("reg_class_agnostic", False):
                    reg_sel = reg.reshape(-1, 4)
                else:
                    reg_sel = jnp.take_along_axis(
                        reg.reshape(reg.shape[0], -1, 4),
                        jnp.maximum(sr.labels, 0)[:, None, None], axis=1)[:, 0]
                beta = float(hc.get("loss_bbox", {}).get("beta", 1.0))
                l1 = _smooth_l1(reg_sel, sr.bbox_targets, beta) * sr.bbox_weights
                lb = l1.sum() / navg
                w = float(loss_w[s]) if s < len(loss_w) else 1.0
                total = total + w * (lc + lb)
                suf = f"_s{s}" if n_stages > 1 else ""
                logs[f"loss_cls{suf}"] = lc
                logs[f"loss_bbox{suf}"] = lb
                logs[f"acc{suf}"] = accuracy(cls, sr.labels,
                                             mask=sr.label_weights > 0)
                last_sr, last_pooled_rois = sr, rois

                # HTC per-stage mask heads with info flow (htc.py:97-104):
                # each stage's mask trains on its own sampled rois
                if with_mask and eng.num_mask_stages > 1:
                    mp = eng.mask_roi_extractor([c5], rois)
                    mp = eng._fuse_semantic(mp, emb, rois, "mask")
                    mpred = mod.apply(params, mp, s, method=mod.mask_stage)
                    lm = mask_branch_loss(
                        mpred.astype(jnp.float32),
                        sample["gt_masks"][sr.gt_inds], rois, sr.labels,
                        sr.pos_mask, mask_size=mask_size,
                        class_agnostic=class_agnostic)
                    total = total + w * lm
                    logs[f"loss_mask_s{s}"] = lm

                if s < n_stages - 1:
                    # refine sampled boxes by predicted class, detached
                    # (cascade_rcnn.py:forward_train → regress_by_class)
                    label = jnp.argmax(cls[:, 1:], axis=1) + 1
                    if hc.get("reg_class_agnostic", False):
                        deltas = reg.reshape(-1, 4)
                    else:
                        deltas = jnp.take_along_axis(
                            reg.reshape(reg.shape[0], -1, 4),
                            label[:, None, None], axis=1)[:, 0]
                    boxes = jax.lax.stop_gradient(delta2bbox(
                        sr.rois, deltas, means, stds, sample["img_shape"]))
                    pmask = sr.valid

            if loss_seg is not None:
                total = total + loss_seg
                logs["loss_semantic_seg"] = loss_seg

            if with_mask and eng.num_mask_stages <= 1:
                mpooled = eng.mask_roi_extractor([c5], last_pooled_rois)
                mpooled = eng._fuse_semantic(mpooled, emb,
                                             last_pooled_rois, "mask")
                mask_pred = mod.apply(params, mpooled, method=mod.mask)
                gt_masks_per_roi = sample["gt_masks"][last_sr.gt_inds]
                lm = mask_branch_loss(
                    mask_pred.astype(jnp.float32), gt_masks_per_roi,
                    last_pooled_rois, last_sr.labels, last_sr.pos_mask,
                    mask_size=mask_size, class_agnostic=class_agnostic)
                total = total + lm
                logs["loss_mask"] = lm

            return total, logs

        return loss_fn


class FasterRCNNTrainer(BaseTrainer):
    """Plain still-image Faster R-CNN objective on the BaseEngine API
    (reference `two_stage.py:forward_train` with a single RCNN stage).

    Drives `engine.detector.FasterRCNN`/`FastRCNN` (the SELSA-style module,
    not MultiStageEngine): RPN loss + rpn_proposal proposals + one
    assign/sample stage + bbox-head CE/SmoothL1.  Accepts either the
    still-image sample layout (``img``/(G,4) gts) or the video layout
    (``imgs``/(F,G,4) — frame 0 is used).
    """

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        canvas = eng._canvas(canvas_h, canvas_w)
        tcfg = eng.train_cfg
        rpn_cfg = tcfg["rpn"]
        prop_cfg = tcfg["rpn_proposal"]
        rcnn = tcfg["rcnn"]
        rcnn = rcnn[0] if isinstance(rcnn, (list, tuple)) else rcnn
        assigner = rcnn["assigner"]
        samp = rcnn["sampler"]
        samp = samp[0] if isinstance(samp, (list, tuple)) else samp
        hc = eng.model_cfg["bbox_head"]
        means = tuple(hc.get("target_means", (0., 0., 0., 0.)))
        stds = tuple(hc.get("target_stds", (0.1, 0.1, 0.2, 0.2)))
        beta = float(hc.get("loss_bbox", {}).get("beta", 1.0))
        has_shared = bool(eng.model_cfg.get("shared_head"))

        def loss_fn(params, sample, rng):
            if "img" in sample:
                img = sample["img"]
                if img.ndim == 3:
                    img = img[None]
                gtb, gtl = sample["gt_bboxes"], sample["gt_labels"]
                gtm = sample["gt_mask"]
                ish, psh = sample["img_shape"], sample["pad_shape"]
            else:
                img = sample["imgs"][:1]
                gtb, gtl = sample["gt_bboxes"][0], sample["gt_labels"][0]
                gtm = sample["gt_mask"][0]
                ish, psh = sample["img_shape"][0], sample["pad_shape"][0]
            rngs = jax.random.split(rng, 2)
            c4 = mod.apply(params, img, method=mod.extract_feat)
            cls_map, reg_map = mod.apply(params, c4, method=mod.rpn)
            c5 = mod.apply(params, c4, method=mod.shared) if has_shared else c4

            tgt = anchor_target_single(
                rngs[0], canvas.anchors, canvas.anchor_valid(psh),
                gtb, gtm, ish, rpn_cfg, eng.rpn_means, eng.rpn_stds)
            loss_rpn_cls, loss_rpn_bbox = _rpn_loss(cls_map[0], reg_map[0], tgt)

            boxes, _, pmask = _rpn_proposals(
                jax.lax.stop_gradient(cls_map[0]),
                jax.lax.stop_gradient(reg_map[0]),
                canvas, psh, ish, prop_cfg, eng.rpn_means, eng.rpn_stds)
            sr = random_sample_and_target(
                rngs[1], boxes, pmask, gtb, gtm, gtl,
                num=int(samp["num"]),
                pos_fraction=float(samp["pos_fraction"]),
                add_gt_as_proposals=bool(samp.get("add_gt_as_proposals", True)),
                pos_iou_thr=float(assigner["pos_iou_thr"]),
                neg_iou_thr=float(assigner["neg_iou_thr"]),
                min_pos_iou=float(assigner["min_pos_iou"]),
                target_means=means, target_stds=stds,
                pos_weight=float(rcnn.get("pos_weight", -1)))
            rois = jnp.concatenate(
                [jnp.zeros((sr.rois.shape[0], 1)), sr.rois], axis=1)
            pooled = eng.roi_extractor([c5], rois)
            cls, reg = mod.apply(params, pooled, 0, rois.shape[0], sr.valid,
                                 method=mod.bbox_forward)
            navg = jnp.maximum((sr.label_weights > 0).sum().astype(
                jnp.float32), 1.0)
            ce = softmax_cross_entropy(cls, sr.labels)
            loss_cls = (ce * sr.label_weights).sum() / navg
            if hc.get("reg_class_agnostic", False):
                reg_sel = reg.reshape(-1, 4)
            else:
                reg_sel = jnp.take_along_axis(
                    reg.reshape(reg.shape[0], -1, 4),
                    jnp.maximum(sr.labels, 0)[:, None, None], axis=1)[:, 0]
            l1 = _smooth_l1(reg_sel, sr.bbox_targets, beta) * sr.bbox_weights
            loss_bbox = l1.sum() / navg
            total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
            return total, dict(
                loss_rpn_cls=loss_rpn_cls, loss_rpn_bbox=loss_rpn_bbox,
                loss_cls=loss_cls, loss_bbox=loss_bbox,
                acc=accuracy(cls, sr.labels, mask=sr.label_weights > 0))

        return loss_fn
