"""Single-stage (dense-head) training — RetinaNet-style objective.

Zoo training path (reference `mmdet/models/detectors/single_stage.py`
forward_train + `anchor_head.py:loss`): multi-level anchors, MaxIoU
assignment without sampling (FocalLoss ⇒ PseudoSampler,
anchor_head.py:62,117-123), sigmoid focal classification over all valid
anchors normalized by the positive count, SmoothL1 box regression on
positives.  Fixed shapes: per-level anchor grids are compile-time constants;
eligibility is the inside-image mask.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.targets import max_iou_assign
from ..models.losses import sigmoid_focal_loss
from ..ops.anchors import AnchorGenerator
from ..ops.boxes import bbox2delta
from .optim import default_trainable_mask, make_optimizer, step_lr_schedule
from .train import TrainState, _smooth_l1


class RetinaTrainer:
    def __init__(self, engine, cfg: Dict[str, Any], mesh=None,
                 steps_per_epoch: int = 1000):
        self.engine = engine
        self.cfg = cfg
        self.mesh = mesh
        opt = cfg.get("optimizer", dict(lr=0.01, momentum=0.9,
                                        weight_decay=1e-4))
        lrc = cfg.get("lr_config", dict(step=[8, 11], warmup_iters=500,
                                        warmup_ratio=1.0 / 3))
        self.schedule = step_lr_schedule(
            float(opt["lr"]), steps_per_epoch, list(lrc.get("step", [])),
            warmup_iters=int(lrc.get("warmup_iters", 500)),
            warmup_ratio=float(lrc.get("warmup_ratio", 1.0 / 3)))
        self._opt_kw = dict(momentum=float(opt.get("momentum", 0.9)),
                            weight_decay=float(opt.get("weight_decay", 1e-4)),
                            clip_norm=float(cfg.get("optimizer_config", {})
                                            .get("grad_clip", {})
                                            .get("max_norm", 35.0)))
        self.tx = None

    def create_state(self, params) -> TrainState:
        mask = default_trainable_mask(params, frozen_stages=1)
        self.tx = make_optimizer(self.schedule, trainable_mask=mask,
                                 **self._opt_kw)
        return TrainState(params, self.tx.init(params),
                          jnp.zeros((), jnp.int32))

    def _level_anchors(self, canvas_hw):
        head = self.engine.model_cfg["bbox_head"]
        strides = tuple(head.get("anchor_strides", (8, 16, 32, 64, 128)))
        ratios = tuple(head.get("anchor_ratios", (0.5, 1.0, 2.0)))
        octave = int(head.get("octave_base_scale", 4))
        spo = int(head.get("scales_per_octave", 3))
        scales = tuple(octave * 2 ** (i / spo) for i in range(spo))
        h, w = canvas_hw
        anchors = []
        for s in strides:
            gen = AnchorGenerator(s, scales, ratios)
            fh, fw = -(-h // s), -(-w // s)
            anchors.append(gen.grid_anchors((fh, fw), s))
        return jnp.asarray(np.concatenate(anchors, axis=0))

    def make_train_step(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        anchors = self._level_anchors((canvas_h, canvas_w))
        tcfg = eng.train_cfg or {}
        acfg = tcfg.get("assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                         min_pos_iou=0.0))
        head = eng.model_cfg["bbox_head"]
        fg = int(head.get("num_classes", 81)) - 1
        means = tuple(head.get("target_means", (0., 0., 0., 0.)))
        stds = tuple(head.get("target_stds", (1., 1., 1., 1.)))

        def loss_fn(params, sample, rng):
            img = sample["imgs"]           # (1, H, W, 3)
            cls_maps, reg_maps = mod.apply(params, img)
            logits = jnp.concatenate(
                [c[0].reshape(-1, fg) for c in cls_maps], axis=0)
            deltas = jnp.concatenate(
                [r[0].reshape(-1, 4) for r in reg_maps], axis=0)
            h = sample["img_shape"][0][0]
            w = sample["img_shape"][0][1]
            inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
                      & (anchors[:, 2] < w) & (anchors[:, 3] < h))
            ar = max_iou_assign(anchors, sample["gt_bboxes"][0],
                                sample["gt_mask"][0], sample["gt_labels"][0],
                                float(acfg["pos_iou_thr"]),
                                float(acfg["neg_iou_thr"]),
                                float(acfg["min_pos_iou"]), box_mask=inside)
            pos = ar.gt_inds > 0
            valid = ar.gt_inds >= 0
            num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
            fl = sigmoid_focal_loss(logits, ar.labels)
            loss_cls = (fl.sum(-1) * valid.astype(jnp.float32)).sum() / num_pos
            gi = jnp.maximum(ar.gt_inds - 1, 0)
            t = bbox2delta(anchors, sample["gt_bboxes"][0][gi][:, :4],
                           means, stds)
            l1 = _smooth_l1(deltas, t, 1.0 / 9.0).sum(-1)
            loss_bbox = (l1 * pos.astype(jnp.float32)).sum() / num_pos
            total = loss_cls + loss_bbox
            return total, dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                               num_pos=num_pos)

        def step(state, batch, rng):
            sample = jax.tree_util.tree_map(lambda x: x[0], batch)
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, sample, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params, opt_state, state.step + 1),
                    dict(logs, loss=loss))

        return jax.jit(step, donate_argnums=(0,))
