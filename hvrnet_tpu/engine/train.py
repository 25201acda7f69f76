"""Training engines — jitted SPMD train steps for SELSA and HVRNet.

Loss semantics follow the reference training paths:
  * SELSA (`selsa_rcnn.py:85-246`): RPN loss on the key frame only; 300
    random-sampled RoIs per frame assigned against the KEY frame's GT; head
    over the 900-row concat (K/V truncated to sampler_num × t_dim rows by the
    head itself); post-hoc OHEM re-weighting to the 128 hardest RoIs
    (`ohem_hnl_sampler.py:83-115`).
  * HVRNet (`hnmb_rcnn.py:224-569`): backbone and RPN under stop-gradient
    with NO RPN loss; triplet-video selection from max-pooled C5 descriptors
    (`get_triplet_patches:74-101`); 128 RoIs per frame per chosen video; the
    4-block HRNMP head with branch+final losses and the margin triplet loss.

Parallelism: pure data parallelism over a 1-D `Mesh` via `shard_map` — each
device consumes its own sample(s); gradients are `pmean`ed over the mesh
(XLA lowers this to an ICI all-reduce), replacing the reference's
NCCL bucketed allreduce (`dist_utils.py:9-56`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.targets import (anchor_target_single, ohem_weights,
                            random_sample_and_target)
from ..models.bbox_heads.bbox_head import flatten_roi_feats
from ..models.losses import (accuracy, binary_cross_entropy_with_logits,
                             softmax_cross_entropy)
from .detector import _rpn_proposals
from .optim import default_trainable_mask, make_optimizer, step_lr_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    #: LossScaleState when the config enables fp16 loss scaling, else None
    #: (reference `mmdet/core/fp16/hooks.py:11-85` Fp16OptimizerHook)
    scale: Any = None


def _smooth_l1(pred, target, beta):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _rpn_loss(cls_map, reg_map, tgt, beta=1.0 / 9.0):
    """Single-image RPN loss (anchor_head.py:141-159), sigmoid cls."""
    logits = cls_map.reshape(-1).astype(jnp.float32)
    reg = reg_map.reshape(-1, 4).astype(jnp.float32)
    n = tgt.num_total_samples
    lbl = (tgt.labels > 0).astype(jnp.float32)
    ce = binary_cross_entropy_with_logits(logits, lbl)
    loss_cls = (ce * tgt.label_weights).sum() / n
    l1 = _smooth_l1(reg, tgt.bbox_targets, beta) * tgt.bbox_weights
    loss_bbox = l1.sum() / n
    return loss_cls, loss_bbox


class BaseTrainer:
    def __init__(self, engine, cfg: Dict[str, Any], mesh: Optional[Mesh] = None,
                 steps_per_epoch: int = 1000):
        self.engine = engine
        self.cfg = cfg
        self.mesh = mesh
        opt = cfg.get("optimizer", dict(lr=2.5e-4, momentum=0.9,
                                        weight_decay=1e-4))
        lrc = cfg.get("lr_config", dict(step=[12], warmup_iters=500,
                                        warmup_ratio=1.0 / 3))
        clip = cfg.get("optimizer_config", {}).get("grad_clip", {}).get(
            "max_norm", 35.0)
        self.schedule = step_lr_schedule(
            float(opt["lr"]), steps_per_epoch, list(lrc.get("step", [])),
            warmup_iters=int(lrc.get("warmup_iters", 500)),
            warmup_ratio=float(lrc.get("warmup_ratio", 1.0 / 3)))
        self._opt_kw = dict(momentum=float(opt.get("momentum", 0.9)),
                            weight_decay=float(opt.get("weight_decay", 1e-4)),
                            clip_norm=float(clip),
                            paramwise_options=opt.get("paramwise_options"))
        self.tx = None
        # fp16 = dict(loss_scale=512.) config key (reference configs +
        # Fp16OptimizerHook, `mmdet/core/fp16/hooks.py:27-36`): scale the
        # loss, unscale the grads, and SKIP the step on non-finite grads.
        # A numeric loss_scale stays fixed (the reference's semantics);
        # loss_scale='dynamic' adds mmcv-style growth/backoff.  On TPU the
        # usual mixed-precision mode is bf16 compute (same exponent range as
        # f32 — no scaling needed, see core/precision.py); this path exists
        # for true-fp16 parity and as an overflow safety net.
        self.loss_scale = None
        fp16 = cfg.get("fp16")
        if fp16:
            from ..core.precision import DynamicLossScale
            ls = fp16.get("loss_scale", 512.0)
            if ls == "dynamic":
                self.loss_scale = DynamicLossScale()
            else:
                self.loss_scale = DynamicLossScale(
                    init_scale=float(ls), growth_factor=1.0,
                    backoff_factor=1.0, growth_interval=1 << 30)

    def create_state(self, params) -> TrainState:
        mask = default_trainable_mask(
            params,
            frozen_stages=int(self.engine.model_cfg["backbone"].get(
                "frozen_stages", 1)),
            freeze_backbone=self.freeze_backbone,
            freeze_rpn=self.freeze_rpn)
        self.tx = make_optimizer(self.schedule, trainable_mask=mask,
                                 params=params, **self._opt_kw)
        scale = self.loss_scale.init() if self.loss_scale else None
        return TrainState(params, self.tx.init(params),
                          jnp.zeros((), jnp.int32), scale)

    freeze_backbone = False
    freeze_rpn = False

    # ------------------------------------------------------------- stepping
    def make_train_step(self, canvas_h: int, canvas_w: int):
        """Returns jitted step(state, batch, rng) → (state, logs).

        batch leaves have a leading device-batch axis sharded over 'data'.
        """
        loss_fn = self._build_loss_fn(canvas_h, canvas_w)
        ls = self.loss_scale

        def grads_one(params, sample, rng, scale_state):
            """Grads of the (possibly scaled) loss; aux carries the TRUE loss
            (the reference backprops ``loss * loss_scale``, hooks.py:63-65)."""
            def run(p):
                loss, logs = loss_fn(p, sample, rng)
                s = scale_state.scale if scale_state is not None else 1.0
                return loss * s, (loss, logs)

            (_, (loss, logs)), grads = jax.value_and_grad(
                run, has_aux=True)(params)
            return loss, logs, grads

        def apply_update(state, loss, logs, grads):
            logs = dict(logs, loss=loss, lr=self.schedule(state.step))
            if ls is None:
                updates, opt_state = self.tx.update(grads, state.opt_state,
                                                    state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(params, opt_state, state.step + 1), logs
            # unscale + finite-check; on overflow skip params AND opt_state
            # (momentum polluted by inf grads would poison later steps)
            grads, finite, scale = ls.unscale_and_check(grads, state.scale)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            updates = ls.apply_or_skip(updates, finite)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old),
                opt_state, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            logs.update(loss_scale=scale.scale,
                        overflow=(~finite).astype(jnp.float32))
            return TrainState(params, opt_state, state.step + 1, scale), logs

        if self.mesh is None or np.prod(self.mesh.devices.shape) == 1:
            def step(state, batch, rng):
                sample = jax.tree_util.tree_map(lambda x: x[0], batch)
                loss, logs, grads = grads_one(state.params, sample, rng,
                                              state.scale)
                return apply_update(state, loss, logs, grads)
            return jax.jit(step, donate_argnums=(0,))

        mesh = self.mesh

        def step(state, batch, rng):
            def local(params, scale_state, lbatch, lrng):
                sample = jax.tree_util.tree_map(lambda x: x[0], lbatch)
                loss, logs, grads = grads_one(params, sample, lrng[0],
                                              scale_state)
                grads = jax.lax.pmean(grads, "data")
                loss = jax.lax.pmean(loss, "data")
                logs = jax.tree_util.tree_map(
                    lambda x: jax.lax.pmean(x, "data"), logs)
                return loss, logs, grads

            sharded = shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P("data"), P("data")),
                out_specs=(P(), P(), P()),
                check_vma=False)
            loss, logs, grads = sharded(state.params, state.scale, batch, rng)
            return apply_update(state, loss, logs, grads)

        return jax.jit(step, donate_argnums=(0,))


class SelsaTrainer(BaseTrainer):
    """SELSA training step (selsa_rcnn.py:85-246 semantics)."""

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        canvas = eng._canvas(canvas_h, canvas_w)
        tcfg = eng.train_cfg
        rpn_cfg = tcfg["rpn"]
        prop_cfg = tcfg["rpn_proposal"]
        rcnn = tcfg["rcnn"]
        assigner = rcnn["assigner"]
        samplers = rcnn["sampler"]
        first = samplers[0] if isinstance(samplers, list) else samplers
        ohem = samplers[1] if isinstance(samplers, list) else None
        key_dim = int(rcnn.get("key_dim", 0))
        P_rois = int(first["num"])          # 300 first-stage RoIs/frame
        head_loss_beta = float((eng.model_cfg["bbox_head"].get("loss_bbox")
                                or {}).get("beta", 1.0))

        def loss_fn(params, sample, rng):
            imgs = sample["imgs"]                 # (F, H, W, 3)
            F = imgs.shape[0]
            rngs = jax.random.split(rng, F + 2)
            c4 = mod.apply(params, imgs, method=mod.extract_feat)
            cls_map, reg_map = mod.apply(params, c4, method=mod.rpn)

            # --- RPN loss: key frame only (selsa_rcnn.py:127-136)
            tgt = anchor_target_single(
                rngs[0], canvas.anchors,
                canvas.anchor_valid(sample["pad_shape"][key_dim]),
                sample["gt_bboxes"][key_dim], sample["gt_mask"][key_dim],
                sample["img_shape"][key_dim], rpn_cfg,
                eng.rpn_means, eng.rpn_stds)
            loss_rpn_cls, loss_rpn_bbox = _rpn_loss(
                cls_map[key_dim], reg_map[key_dim], tgt)

            # --- proposals per frame (train_cfg.rpn_proposal; no grad)
            c5 = mod.apply(params, c4, method=mod.shared)
            rois_list, valid_list, sr_list = [], [], []
            for i in range(F):
                boxes, scores, pmask = _rpn_proposals(
                    jax.lax.stop_gradient(cls_map[i]),
                    jax.lax.stop_gradient(reg_map[i]),
                    canvas, sample["pad_shape"][i], sample["img_shape"][i],
                    prop_cfg, eng.rpn_means, eng.rpn_stds)
                # assign/sample vs the KEY frame's GT (selsa_rcnn.py:163-166)
                sr = random_sample_and_target(
                    rngs[1 + i], boxes, pmask,
                    sample["gt_bboxes"][key_dim], sample["gt_mask"][key_dim],
                    sample["gt_labels"][key_dim],
                    num=P_rois, pos_fraction=float(first["pos_fraction"]),
                    add_gt_as_proposals=bool(first.get("add_gt_as_proposals", True)),
                    pos_iou_thr=float(assigner["pos_iou_thr"]),
                    neg_iou_thr=float(assigner["neg_iou_thr"]),
                    min_pos_iou=float(assigner["min_pos_iou"]),
                    target_means=eng.target_means,
                    target_stds=eng.target_stds,
                    pos_weight=float(rcnn.get("pos_weight", -1)))
                sr_list.append(sr)
                idx = jnp.full((P_rois, 1), i, jnp.float32)
                rois_list.append(jnp.concatenate([idx, sr.rois], axis=1))
                valid_list.append(sr.valid)

            rois = jnp.concatenate(rois_list, axis=0)
            valid = jnp.concatenate(valid_list, axis=0)
            pooled = eng.roi_extractor([c5], rois)
            cls, reg = mod.apply(params, pooled, key_dim * P_rois, P_rois,
                                 valid, method=mod.bbox_forward)

            # --- key-frame targets + OHEM re-weighting (selsa_rcnn.py:204-232)
            key = sr_list[key_dim]
            ce = softmax_cross_entropy(cls, key.labels)
            if ohem is not None:
                lw, bw, sel, pos_sel = ohem_weights(
                    key.labels, key.label_weights, key.bbox_weights,
                    jax.lax.stop_gradient(ce), key.valid,
                    int(ohem["num"]), float(ohem["pos_fraction"]))
                navg = jnp.maximum(sel.sum().astype(jnp.float32), 1.0)
            else:
                lw = key.label_weights
                bw = key.bbox_weights
                pos_sel = key.pos_mask
                navg = jnp.maximum((lw > 0).sum().astype(jnp.float32), 1.0)
            loss_cls = (ce * lw).sum() / navg
            acc = accuracy(cls, key.labels, mask=lw > 0)
            l1 = _smooth_l1(reg.reshape(-1, 4), key.bbox_targets,
                            head_loss_beta) * bw
            loss_bbox = l1.sum() / navg

            total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
            logs = dict(loss_rpn_cls=loss_rpn_cls, loss_rpn_bbox=loss_rpn_bbox,
                        loss_cls=loss_cls, loss_bbox=loss_bbox, acc=acc)
            return total, logs

        return loss_fn


class HNMBTrainer(BaseTrainer):
    """HVRNet triplet-video training step (hnmb_rcnn.py:224-569 semantics)."""

    freeze_backbone = True   # backbone under no_grad (hnmb_rcnn.py:59-72)
    freeze_rpn = True        # RPN under no_grad, no RPN loss (:321-335)

    def _build_loss_fn(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        canvas = eng._canvas(canvas_h, canvas_w)
        tcfg = eng.train_cfg
        prop_cfg = tcfg["rpn_proposal"]
        rcnn = tcfg["rcnn"]
        assigner = rcnn["assigner"]
        sampler = rcnn["sampler"]
        key_dim = int(rcnn.get("key_dim", 0))
        S = int(sampler["num"])             # 128 RoIs/frame
        head_cfg = eng.model_cfg["bbox_head"]
        ipv = int(head_cfg.get("imgs_per_video", 3))
        video_per_cls = 3
        chosen = 3
        head_loss_beta = float((head_cfg.get("loss_bbox") or {})
                               .get("beta", 1.0))

        def loss_fn(params, sample, rng):
            imgs = sample["imgs"]               # (V*ipv, H, W, 3)
            n_frames = imgs.shape[0]
            n_videos = n_frames // ipv
            assert n_videos > video_per_cls, (
                "HVRNet training needs extra-class videos beyond the "
                f"{video_per_cls} same-class ones (got {n_videos} videos)")
            rngs = jax.random.split(rng, n_frames + 1)

            # backbone + RPN + C5 for selection: all no-grad (:54-72)
            c4 = jax.lax.stop_gradient(
                mod.apply(params, imgs, method=mod.extract_feat))
            c5_sel = jax.lax.stop_gradient(
                mod.apply(params, c4, method=mod.shared))

            # --- triplet-video selection (get_triplet_patches:74-101)
            frame_desc = c5_sel.mean(axis=(1, 2))               # (F, 256)
            video_desc = frame_desc.reshape(n_videos, ipv, -1).max(axis=1)
            d = video_desc.shape[-1]
            key_block = video_desc[:video_per_cls]               # same-class
            sim = (video_desc[0:1] @ key_block.T) / jnp.sqrt(jnp.float32(d))
            sim = jax.nn.softmax(sim, axis=1)
            hard_same = jnp.argmin(sim[0, 1:]) + 1               # hardest same-class
            chosen_pair = jnp.stack([video_desc[0], video_desc[hard_same]])
            extra = video_desc[video_per_cls:]
            esim = (chosen_pair @ extra.T) / jnp.sqrt(jnp.float32(d))
            esim = jax.nn.softmax(esim, axis=1).sum(axis=0)
            hard_extra = jnp.argmax(esim) + video_per_cls        # most-confusing other-class
            chosen_ids = jnp.stack(
                [jnp.int32(0), hard_same.astype(jnp.int32),
                 hard_extra.astype(jnp.int32)])

            # gather chosen videos' tensors (dynamic indices, static shapes)
            def per_video(x):
                return x.reshape((n_videos, ipv) + x.shape[1:])[chosen_ids]

            c4_v = per_video(c4)                 # (3, ipv, h, w, 1024)
            gt_b = per_video(sample["gt_bboxes"])
            gt_l = per_video(sample["gt_labels"])
            gt_m = per_video(sample["gt_mask"])
            img_shape_v = per_video(sample["img_shape"])
            pad_shape_v = per_video(sample["pad_shape"])

            feats, valids, labels_parts = [], [], []
            lw_parts, bt_parts, bw_parts = [], [], []
            for v in range(chosen):
                c4f = c4_v[v]                                    # (ipv, h, w, C)
                cls_map, reg_map = mod.apply(params, c4f, method=mod.rpn)
                cls_map = jax.lax.stop_gradient(cls_map)
                reg_map = jax.lax.stop_gradient(reg_map)
                c5f = mod.apply(params, c4f, method=mod.shared)  # grads flow (:339-340)
                rois_list, valid_list, srs = [], [], []
                for i in range(ipv):
                    boxes, scores, pmask = _rpn_proposals(
                        cls_map[i], reg_map[i], canvas, pad_shape_v[v, i],
                        img_shape_v[v, i], prop_cfg, eng.rpn_means, eng.rpn_stds)
                    sr = random_sample_and_target(
                        rngs[v * ipv + i], boxes, pmask,
                        gt_b[v, key_dim], gt_m[v, key_dim], gt_l[v, key_dim],
                        num=S, pos_fraction=float(sampler["pos_fraction"]),
                        add_gt_as_proposals=bool(
                            sampler.get("add_gt_as_proposals", True)),
                        pos_iou_thr=float(assigner["pos_iou_thr"]),
                        neg_iou_thr=float(assigner["neg_iou_thr"]),
                        min_pos_iou=float(assigner["min_pos_iou"]),
                        target_means=eng.target_means,
                        target_stds=eng.target_stds,
                        pos_weight=float(rcnn.get("pos_weight", -1)))
                    srs.append(sr)
                    idx = jnp.full((S, 1), i, jnp.float32)
                    rois_list.append(jnp.concatenate([idx, sr.rois], axis=1))
                    valid_list.append(sr.valid)
                rois = jnp.concatenate(rois_list, axis=0)
                pooled = eng.roi_extractor([c5f], rois)          # (ipv*S, 7,7,C)
                feats.append(pooled)
                valids.append(jnp.concatenate(valid_list, axis=0))
                key_sr = srs[key_dim]
                labels_parts.append(key_sr.labels)
                lw_parts.append(key_sr.label_weights)
                bt_parts.append(key_sr.bbox_targets)
                bw_parts.append(key_sr.bbox_weights)

            bbox_feats = jnp.stack(feats)                        # (3, ipv*S, 7,7,C)
            valid_mask = jnp.stack(valids)
            labels_key = jnp.concatenate(labels_parts)           # (3*S,)
            lw = jnp.concatenate(lw_parts)
            bt = jnp.concatenate(bt_parts)
            bw = jnp.concatenate(bw_parts)

            (cls_list, reg_list, loss_trip) = mod.apply(
                params, bbox_feats, labels_key, valid_mask,
                method=mod.bbox_forward_train_hrnmp)

            # multi-branch losses (hrnmp_bbox_head.py:969-1007)
            navg = jnp.maximum((lw > 0).sum().astype(jnp.float32), 1.0)
            n_rows = jnp.float32(labels_key.shape[0])
            logs = dict(loss_trip=loss_trip)
            total = loss_trip
            for bi, (cls, reg) in enumerate(zip(cls_list, reg_list)):
                ce = softmax_cross_entropy(cls, labels_key)
                lc = (ce * lw).sum() / navg
                l1 = _smooth_l1(reg.reshape(-1, 4), bt, head_loss_beta) * bw
                lb = l1.sum() / n_rows
                logs[f"loss_cls_{bi + 1}"] = lc
                logs[f"loss_bbox_{bi + 1}"] = lb
                logs[f"acc_{bi + 1}"] = accuracy(cls, labels_key, mask=lw > 0)
                total = total + lc + lb
            return total, logs

        return loss_fn
