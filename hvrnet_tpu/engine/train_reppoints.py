"""RepPoints training objective (reference
`mmdet/models/anchor_heads/reppoints_head.py:333-505` +
`mmdet/core/bbox/assigners/point_assigner.py`):

  * **Init stage** — each gt is scale-assigned to a pyramid level
    (`log2(sqrt(wh)/scale)`) and claims its `pos_num` nearest points there
    unless a closer gt already claimed them (PointAssigner); SmoothL1 on the
    points2bbox of the init offsets, normalized by `point_base_scale·stride`.
  * **Refine stage** — the init-stage boxes (detached, in image coords) are
    MaxIoU-assigned to gts; focal cls + SmoothL1 on the refine points2bbox.
  * `points2bbox` supports the reference's `minmax` and `moment` transforms
    (the latter with the learnable `moment_transfer` log half-extents and
    the `moment_mul` gradient-damping trick).

TPU adaptations: flat all-level point set as a compile-time constant; the
PointAssigner's sequential per-gt loop becomes a `fori_loop` carrying
(assigned, best_dist) — same "k-nearest unless closer gt recorded" rule.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.targets import max_iou_assign
from ..models.losses import sigmoid_focal_loss
from .train import TrainState, _smooth_l1
from .train_fcos import FCOSTrainer

INF = 1e8


def reppoints_points(canvas_hw, strides):
    """Flat all-level centers (P, 2), per-point stride (P,) — the reference
    point generator places points at i·stride (get_points:293-332)."""
    h, w = canvas_hw
    pts, st = [], []
    for s in strides:
        fh, fw = -(-h // s), -(-w // s)
        xs = (np.arange(fw) * s).astype(np.float32)
        ys = (np.arange(fh) * s).astype(np.float32)
        xx, yy = np.meshgrid(xs, ys)
        pts.append(np.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        st.append(np.full(fh * fw, s, np.float32))
    return (jnp.asarray(np.concatenate(pts)),
            jnp.asarray(np.concatenate(st)))


def points2bbox(pts_xy, method="moment", moment_transfer=None,
                moment_mul=0.01):
    """(N, 2K) xy-interleaved point sets → (N, 4) boxes
    (reppoints_head.py:164-214, y_first=False)."""
    N = pts_xy.shape[0]
    p = pts_xy.reshape(N, -1, 2)
    px, py = p[..., 0], p[..., 1]
    if method == "minmax":
        return jnp.stack([px.min(1), py.min(1), px.max(1), py.max(1)], -1)
    if method == "partial_minmax":
        px, py = px[:, :4], py[:, :4]
        return jnp.stack([px.min(1), py.min(1), px.max(1), py.max(1)], -1)
    assert method == "moment", method
    mx = px.mean(1)
    my = py.mean(1)
    sx = jnp.std(px - mx[:, None], axis=1, ddof=1)
    sy = jnp.std(py - my[:, None], axis=1, ddof=1)
    mt = (moment_transfer * moment_mul
          + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
    hw_ = sx * jnp.exp(mt[0])
    hh = sy * jnp.exp(mt[1])
    return jnp.stack([mx - hw_, my - hh, mx + hw_, my + hh], -1)


def point_assign(points, point_strides, gt_bboxes, gt_mask, scale=4,
                 pos_num=1):
    """PointAssigner (point_assigner.py:22-120) with fixed gt slots.

    Returns gt_inds (P,) int32: 0 = negative, i+1 = gt i.
    """
    P = points.shape[0]
    pts_lvl = jnp.floor(jnp.log2(point_strides)).astype(jnp.int32)
    lvl_min, lvl_max = pts_lvl.min(), pts_lvl.max()
    ctr = (gt_bboxes[:, :2] + gt_bboxes[:, 2:4]) / 2
    wh = jnp.clip(gt_bboxes[:, 2:4] - gt_bboxes[:, :2], 1e-6, None)
    gt_lvl = jnp.clip(
        ((jnp.log2(wh[:, 0] / scale) + jnp.log2(wh[:, 1] / scale)) / 2)
        .astype(jnp.int32), lvl_min, lvl_max)
    # (G, P) normalized center distances, masked off-level → INF
    d = jnp.linalg.norm(
        (points[None, :, :] - ctr[:, None, :]) / wh[:, None, :], axis=-1)
    d = jnp.where(pts_lvl[None, :] == gt_lvl[:, None], d, INF)
    d = jnp.where(gt_mask[:, None], d, INF)

    def body(i, carry):
        assigned, best = carry
        di = d[i]
        # pos_num nearest with stable index tie-break (torch.topk picks the
        # first of equal distances; stable argsort reproduces that)
        rank = jnp.argsort(jnp.argsort(di, stable=True), stable=True)
        chosen = (rank < pos_num) & (di < INF / 2) & (di < best)
        return (jnp.where(chosen, i + 1, assigned),
                jnp.where(chosen, di, best))

    assigned, _ = jax.lax.fori_loop(
        0, gt_bboxes.shape[0], body,
        (jnp.zeros(P, jnp.int32), jnp.full(P, jnp.inf)))
    return assigned


class RepPointsTrainer:
    """RepPoints two-stage points training step (reppoints_head.py:408-505)."""

    def __init__(self, engine, cfg: Dict[str, Any], mesh=None,
                 steps_per_epoch: int = 1000):
        FCOSTrainer.__init__(self, engine, cfg, mesh, steps_per_epoch)

    create_state = FCOSTrainer.create_state

    def make_train_step(self, canvas_h: int, canvas_w: int):
        eng = self.engine
        mod = eng.module
        head = eng.model_cfg["bbox_head"]
        strides = tuple(head.get("point_strides", (8, 16, 32, 64, 128)))
        num_points = int(head.get("num_points", 9))
        base_scale = float(head.get("point_base_scale", 4))
        method = str(head.get("transform_method", "moment"))
        moment_mul = float(head.get("moment_mul", 0.01))
        fg = int(head.get("num_classes", 81)) - 1
        tcfg = eng.train_cfg or {}
        init_cfg = tcfg.get("init", dict(
            assigner=dict(type="PointAssigner", scale=4, pos_num=1)))
        refine_cfg = tcfg.get("refine", dict(
            assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)))
        w_init = float((head.get("loss_bbox_init") or {}).get(
            "loss_weight", 0.5))
        w_refine = float((head.get("loss_bbox_refine") or {}).get(
            "loss_weight", 1.0))
        beta_init = float((head.get("loss_bbox_init") or {}).get(
            "beta", 1.0 / 9.0))
        beta_refine = float((head.get("loss_bbox_refine") or {}).get(
            "beta", 1.0 / 9.0))
        points, pstride = reppoints_points((canvas_h, canvas_w), strides)

        def offsets_to_coords(maps):
            """Per-level (1, h, w, 2K) y-first offsets → flat (P, 2K)
            xy-interleaved image coords (offset_to_pts:349-370)."""
            parts = []
            start = 0
            for lvl, m in enumerate(maps):
                o = m[0].reshape(-1, num_points, 2).astype(jnp.float32)
                xy = jnp.stack([o[..., 1], o[..., 0]], -1)   # y-first → xy
                n = xy.shape[0]
                c = jax.lax.dynamic_slice_in_dim(points, start, n, 0)
                pts = xy * strides[lvl] + c[:, None, :]
                parts.append(pts.reshape(n, 2 * num_points))
                start += n
            return jnp.concatenate(parts, axis=0)

        def loss_fn(params, sample, rng):
            cls_maps, init_maps, refine_maps = mod.apply(
                params, sample["imgs"])
            mt = (params["params"]["bbox_head"].get("moment_transfer")
                  if method == "moment" else None)
            gt_b = sample["gt_bboxes"][0]
            gt_m = sample["gt_mask"][0]
            gt_l = sample["gt_labels"][0]

            logits = jnp.concatenate(
                [c[0].reshape(-1, fg) for c in cls_maps], axis=0
            ).astype(jnp.float32)
            pts_init = offsets_to_coords(init_maps)
            pts_refine = offsets_to_coords(refine_maps)
            box_init = points2bbox(pts_init, method, mt, moment_mul)
            box_refine = points2bbox(pts_refine, method, mt, moment_mul)

            # --- init stage: PointAssigner on the centers (:452-463)
            icfg = init_cfg["assigner"]
            gi_init = point_assign(points, pstride, gt_b, gt_m,
                                   scale=float(icfg.get("scale", 4)),
                                   pos_num=int(icfg.get("pos_num", 1)))
            pos_i = gi_init > 0
            n_init = jnp.maximum(pos_i.sum().astype(jnp.float32), 1.0)
            tgt_i = gt_b[jnp.maximum(gi_init - 1, 0)][:, :4]
            norm = (base_scale * pstride)[:, None]
            l1_i = _smooth_l1(box_init / norm, tgt_i / norm, beta_init
                              ).sum(-1)
            loss_init = w_init * (
                l1_i * pos_i.astype(jnp.float32)).sum() / n_init

            # --- refine stage: MaxIoU on detached init boxes (:465-489)
            rcfg = refine_cfg["assigner"]
            ar = max_iou_assign(jax.lax.stop_gradient(box_init), gt_b, gt_m,
                                gt_l, float(rcfg["pos_iou_thr"]),
                                float(rcfg["neg_iou_thr"]),
                                float(rcfg["min_pos_iou"]))
            pos_r = ar.gt_inds > 0
            valid = ar.gt_inds >= 0
            n_ref = jnp.maximum(pos_r.sum().astype(jnp.float32), 1.0)
            fl = sigmoid_focal_loss(logits, ar.labels)
            loss_cls = (fl.sum(-1) * valid.astype(jnp.float32)).sum() / n_ref
            tgt_r = gt_b[jnp.maximum(ar.gt_inds - 1, 0)][:, :4]
            l1_r = _smooth_l1(box_refine / norm, tgt_r / norm, beta_refine
                              ).sum(-1)
            loss_refine = w_refine * (
                l1_r * pos_r.astype(jnp.float32)).sum() / n_ref

            total = loss_cls + loss_init + loss_refine
            return total, dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                               loss_pts_refine=loss_refine,
                               num_pos_init=n_init, num_pos=n_ref)

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
