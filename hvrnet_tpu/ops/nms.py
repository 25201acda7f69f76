"""Shape-static NMS family for TPU.

The reference implements NMS as a CUDA bitmask kernel
(`/root/reference/mmdet/ops/nms/src/nms_kernel.cu:14-22` — IoU in the
+1-pixel convention, greedy in descending score order) and soft-NMS in Cython
(`soft_nms_cpu.pyx:22`).  On TPU, dynamic output shapes are hostile to XLA, so
all variants here are fixed-size: they run a greedy *pick loop* — ``max_out``
iterations of (argmax over live scores → suppress overlaps) — and return
padded index arrays plus validity masks.  The pick loop is mathematically
identical to greedy NMS truncated to its first ``max_out`` survivors, which is
exactly the reference's ``nms(...)[:nms_post]`` usage pattern.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# candidates resolved per sequential round of the tiled greedy loop; 64
# matches the CUDA kernel's 64-box blocks (nms_kernel.cu:12) and measured
# fastest on v5e (sweep in BASELINE.md).  Exact at every value (oracle
# test covers 8-128); env knob for hardware retuning.
DEFAULT_TILE = int(os.environ.get("HVRNET_NMS_TILE", "64"))


def _iou_row(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one box vs a set, +1 convention (nms_kernel.cu:14-22)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    area_b = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-10)


def _tile_greedy_keep(adj: jnp.ndarray, cand_ok: jnp.ndarray) -> jnp.ndarray:
    """Greedy keep decisions within one score-sorted tile, as a fixpoint.

    The greedy rule — keep i iff no kept j<i overlaps it — is the unique
    fixpoint of: a candidate whose higher-scored overlapping neighbours are
    all dead becomes KEPT; one overlapping a kept neighbour becomes DEAD.
    Each pass decides at least the highest-scored undecided candidate, and
    in practice whole suppression layers resolve per pass, so the loop runs
    ~3-6 data-dependent passes of fully-vectorized (tile × tile) mask
    reductions instead of `tile` sequential prefix steps (the chain was the
    latency floor of the old loop and the reason tiles beyond 64 regressed
    — BASELINE.md round-2 tile sweep).
    """
    tile = adj.shape[0]
    upper = jnp.triu(adj, k=1)      # upper[j, i]: higher-scored j overlaps i

    def cond(c):
        undecided, _ = c
        return undecided.any()

    def body(c):
        undecided, kept = c
        blocked = (upper & undecided[:, None]).any(axis=0)
        newly = undecided & ~blocked & ~(upper & kept[:, None]).any(axis=0)
        kept = kept | newly
        dead = (upper & kept[:, None]).any(axis=0)
        undecided = undecided & ~newly & ~dead
        return undecided, kept

    _, keep = jax.lax.while_loop(
        cond, body, (cand_ok, jnp.zeros((tile,), bool)))
    return keep


def _nms_pick_loop(boxes: jnp.ndarray, live0: jnp.ndarray, iou_thr: float,
                   quota: int, n_out: int,
                   out_groups: Optional[jnp.ndarray],
                   sup_groups: Optional[jnp.ndarray],
                   tile: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared tiled greedy pick loop with per-out-group output quotas.

    Each round pulls the ``tile`` highest-scoring live candidates across ALL
    groups, resolves the greedy keep/suppress decisions within the tile
    (suppression masked to same-``sup_groups`` pairs — grouped NMS over a
    union of candidate sets is EXACTLY per-group greedy NMS, no cross-group
    terms exist), scatters each kept box into its out-group's next slot, and
    suppresses the remaining pool against this round's keeps.

    Quota semantics are exact for "per-group greedy NMS truncated to the
    first ``quota`` survivors" (the reference's ``nms(...)[:post]`` and
    multiclass-NMS ``[:max_num]`` patterns): a survivor past its group's
    quota can only ever suppress lower-scored same-sup-group candidates,
    which are themselves past the quota — so dropping it from the output
    while still letting it suppress changes nothing observable, and lets the
    pool retire faster.  Groups whose quota is full have their remaining
    candidates retired wholesale.

    Returns:
        out_idx: (n_out, quota) int32 indices into the input.
        out_mask: (n_out, quota) bool.
    """
    n = boxes.shape[0]
    cap = n_out * quota

    def cond(carry):
        live, out_idx, out_mask, cnt, rounds = carry
        return ((cnt < quota).any() & (live.max() > NEG_INF / 2)
                & (rounds < cap))

    def body(carry):
        live, out_idx, out_mask, cnt, rounds = carry
        top_s, top_i = jax.lax.top_k(live, tile)
        cand_ok = top_s > NEG_INF / 2
        cb = boxes[top_i]                                   # (tile, 4)
        lt = jnp.maximum(cb[:, None, :2], cb[None, :, :2])
        rb = jnp.minimum(cb[:, None, 2:4], cb[None, :, 2:4])
        wh = jnp.clip(rb - lt + 1.0, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        area = (cb[:, 2] - cb[:, 0] + 1.0) * (cb[:, 3] - cb[:, 1] + 1.0)
        iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-10)
        adj = iou > iou_thr                                  # (tile, tile)
        if sup_groups is not None:
            cg = sup_groups[top_i]
            adj = adj & (cg[:, None] == cg[None, :])

        keep = _tile_greedy_keep(adj, cand_ok)

        # per-out-group output slots; over-quota keeps drop from the output
        # (but still suppress — see docstring) via a dump slot at index cap
        if out_groups is not None:
            qg = out_groups[top_i]                           # (tile,)
            same_q = qg[:, None] == qg[None, :]
            prefix = (jnp.triu(same_q, k=1) & keep[:, None]).sum(axis=0)
            before = cnt[qg] + prefix
            emit = keep & (before < quota)
            pos = qg * quota + before
            cnt = cnt.at[qg].add(emit.astype(jnp.int32))
        else:
            prefix = jnp.cumsum(keep.astype(jnp.int32)) - 1
            before = cnt[0] + prefix
            emit = keep & (before < quota)
            pos = before
            cnt = cnt.at[0].add(emit.sum())
        pos_w = jnp.where(emit, jnp.clip(pos, 0, cap - 1), cap)
        out_idx = out_idx.at[pos_w].set(top_i.astype(jnp.int32))
        out_mask = out_mask.at[pos_w].set(True)

        # retire the whole tile and suppress the pool vs this round's keeps
        live = live.at[top_i].set(NEG_INF)
        kb = jnp.where(keep[:, None], cb, -1e8)             # inert rows
        lt = jnp.maximum(kb[:, None, :2], boxes[None, :, :2])
        rb = jnp.minimum(kb[:, None, 2:4], boxes[None, :, 2:4])
        wh = jnp.clip(rb - lt + 1.0, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        karea = (kb[:, 2] - kb[:, 0] + 1.0) * (kb[:, 3] - kb[:, 1] + 1.0)
        barea = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
        pio = inter / jnp.maximum(karea[:, None] + barea[None, :] - inter, 1e-10)
        psup = keep[:, None] & (pio > iou_thr)
        if sup_groups is not None:
            psup = psup & (sup_groups[top_i][:, None] == sup_groups[None, :])
        live = jnp.where(psup.any(axis=0), NEG_INF, live)
        if out_groups is not None:
            live = jnp.where(cnt[out_groups] >= quota, NEG_INF, live)
        return live, out_idx, out_mask, cnt, rounds + 1

    out_idx = jnp.zeros((cap + 1,), jnp.int32)
    out_mask = jnp.zeros((cap + 1,), bool)
    _, out_idx, out_mask, _, _ = jax.lax.while_loop(
        cond, body,
        (live0, out_idx, out_mask, jnp.zeros((n_out,), jnp.int32),
         jnp.int32(0)))
    return (out_idx[:cap].reshape(n_out, quota),
            out_mask[:cap].reshape(n_out, quota))


def nms_static(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float,
               max_out: int, valid: Optional[jnp.ndarray] = None,
               tile: Optional[int] = None,
               groups: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a static number of outputs — exact tiled algorithm.

    Bit-identical to sequential greedy NMS truncated to its first
    ``max_out`` survivors (exactly the reference's ``nms(...)[:nms_post]``
    pattern, nms_kernel.cu:14-22): a candidate's fate depends only on
    higher-scored boxes, all of which are either in the current tile or
    already processed.  See ``_nms_pick_loop`` / ``_tile_greedy_keep``.

    Args:
        boxes: (N, 4) float32.
        scores: (N,) float32.
        iou_thr: suppression threshold.
        max_out: number of survivors to emit (pad + mask when fewer exist).
        valid: optional (N,) bool, False rows are ignored entirely.
        tile: candidates processed per round.
        groups: optional (N,) int32 — suppression only happens within the
            same group (boxes of different groups never interact).  Running
            grouped NMS over the union of per-class candidate sets is
            EXACTLY per-class greedy NMS (no cross-group terms exist), with
            one shared pick loop instead of one while_loop per class.

    Returns:
        keep_idx: (max_out,) int32 indices into the input (0 where invalid).
        keep_mask: (max_out,) bool.
    """
    n = boxes.shape[0]
    tile = min(tile if tile is not None else DEFAULT_TILE, n)
    live0 = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    out_idx, out_mask = _nms_pick_loop(
        boxes.astype(jnp.float32), live0.astype(jnp.float32), iou_thr,
        max_out, 1, None, groups, tile)
    return out_idx[0], out_mask[0]


def nms_static_lanes(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float,
                     max_out: int, valid: Optional[jnp.ndarray] = None,
                     tile: Optional[int] = None,
                     sup_groups: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """B independent NMS problems in ONE shared pick loop.

    Args:
        boxes: (B, N, 4); scores: (B, N); valid: optional (B, N).
        max_out: per-lane survivor quota.
        sup_groups: optional (B, N) finer-than-lane suppression groups
            (e.g. per-class ids for a batched multiclass decode).

    Returns:
        keep_idx: (B, max_out) int32 indices into each lane's N rows.
        keep_mask: (B, max_out) bool.

    Exact per lane (lanes never interact).  vmapping ``nms_static`` instead
    lowers the while_loop to lockstep gathers (the vmap pathology measured
    in BASELINE.md); unrolled per-lane loops run sequentially on the single
    TPU instruction stream.  One loop over the union retires ``tile``
    candidates per round regardless of which lanes they come from.
    """
    B, n = scores.shape
    tile = min(tile if tile is not None else DEFAULT_TILE * B, B * n)
    live0 = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    lanes = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n)
    if sup_groups is not None:
        # offset per-lane group ids into disjoint ranges
        span = jnp.int32(2) ** 20
        sg = sup_groups.reshape(-1).astype(jnp.int32) + lanes * span
    else:
        sg = lanes
    out_idx, out_mask = _nms_pick_loop(
        boxes.reshape(-1, 4).astype(jnp.float32),
        live0.reshape(-1).astype(jnp.float32), iou_thr,
        max_out, B, lanes, sg, tile)
    local = jnp.clip(out_idx - jnp.arange(B, dtype=jnp.int32)[:, None] * n,
                     0, n - 1)   # unwritten slots hold 0 and are mask-False
    return local, out_mask


def nms(dets: jnp.ndarray, iou_thr: float, max_out: Optional[int] = None,
        valid: Optional[jnp.ndarray] = None):
    """Reference-style entry: dets (N, 5) = boxes+score → (kept dets, idx, mask).

    Mirrors `mmdet.ops.nms` (`nms_wrapper.py`) modulo static padding.
    """
    max_out = max_out or dets.shape[0]
    idx, mask = nms_static(dets[:, :4], dets[:, 4], iou_thr, max_out, valid)
    kept = dets[idx] * mask[:, None]
    return kept, idx, mask


def soft_nms_static(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float = 0.3,
                    method: str = "linear", sigma: float = 0.5,
                    min_score: float = 1e-3, max_out: int = 300,
                    valid: Optional[jnp.ndarray] = None):
    """Soft-NMS (`soft_nms_cpu.pyx:22`) as a static pick-and-decay loop.

    Present for API parity (unused by the two reference configs).
    """
    assert method in ("linear", "gaussian", "naive")
    live = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    live = live.astype(jnp.float32)

    def body(i, carry):
        live, keep_idx, keep_score, keep_mask = carry
        j = jnp.argmax(live)
        ok = live[j] > min_score
        keep_idx = keep_idx.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        keep_score = keep_score.at[i].set(jnp.where(ok, live[j], 0.0))
        keep_mask = keep_mask.at[i].set(ok)
        ious = _iou_row(boxes[j], boxes)
        if method == "linear":
            decay = jnp.where(ious > iou_thr, 1.0 - ious, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(ious * ious) / sigma)
        else:  # naive == hard nms
            decay = jnp.where(ious > iou_thr, 0.0, 1.0)
        live = jnp.where(ok, live * decay, live)
        live = jnp.where(live < min_score, NEG_INF, live)
        live = live.at[j].set(NEG_INF)
        return live, keep_idx, keep_score, keep_mask

    keep_idx = jnp.zeros((max_out,), jnp.int32)
    keep_score = jnp.zeros((max_out,), jnp.float32)
    keep_mask = jnp.zeros((max_out,), bool)
    _, keep_idx, keep_score, keep_mask = jax.lax.fori_loop(
        0, max_out, body, (live, keep_idx, keep_score, keep_mask))
    return keep_idx, keep_score, keep_mask


def multiclass_nms_static(multi_bboxes: jnp.ndarray, multi_scores: jnp.ndarray,
                          score_thr: float, iou_thr: float, max_num: int,
                          valid: Optional[jnp.ndarray] = None,
                          score_factors: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-class NMS (`/root/reference/mmdet/core/post_processing/bbox_nms.py:6-67`).

    Args:
        multi_bboxes: (N, 4) or (N, C*4).
        multi_scores: (N, C); column 0 is background and is skipped.
        valid: optional (N,) mask for padded proposal rows.

    Returns:
        dets: (max_num, 5) [x1, y1, x2, y2, score], zero-padded.
        labels: (max_num,) int32, 0-based foreground labels.
        mask: (max_num,) bool validity.
    """
    # ONE grouped pick loop over the union of all classes' candidates:
    # suppression is masked to same-class pairs, which is exactly per-class
    # greedy NMS (classes never interact), and the result is already in
    # global score order so the reference's final top-max_num
    # (bbox_nms.py:58-63) is just the loop's own output cap.  A per-class
    # vmap of nms_static lowers the while_loop to lockstep gathers (the
    # vmap pathology measured in BASELINE.md) — one shared loop runs the
    # same number of rounds as a SINGLE class.
    flat_boxes, flat_scores, flat_valid, flat_groups = _multiclass_candidates(
        multi_bboxes, multi_scores, score_thr, valid, score_factors)

    keep_idx, out_mask = nms_static(flat_boxes, flat_scores, iou_thr, max_num,
                                    flat_valid, groups=flat_groups)
    out_boxes = flat_boxes[keep_idx] * out_mask[:, None]
    out_scores = jnp.where(out_mask, flat_scores[keep_idx], 0.0)
    out_labels = jnp.where(out_mask, flat_groups[keep_idx], 0)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    return dets, out_labels, out_mask


def _multiclass_candidates(multi_bboxes, multi_scores, score_thr,
                           valid, score_factors):
    """Flatten (…, N, C) class scores into per-class candidate rows.

    Shared by the single-image and lanes variants; leading batch dims (if
    any) are preserved: returns (…, fg·N, 4) boxes, (…, fg·N) scores/valid
    and the (fg·N,) class-id row layout."""
    n, num_classes = multi_scores.shape[-2], multi_scores.shape[-1]
    fg = num_classes - 1
    lead = multi_scores.shape[:-2]
    if multi_bboxes.shape[-1] == 4:
        cls_boxes = jnp.broadcast_to(multi_bboxes[..., None, :, :],
                                     lead + (fg, n, 4))
    else:
        cls_boxes = jnp.moveaxis(
            multi_bboxes.reshape(lead + (n, num_classes, 4))[..., 1:, :],
            -2, -3)
    cls_scores = jnp.moveaxis(multi_scores[..., 1:], -1, -2)  # (…, fg, N)
    if score_factors is not None:
        cls_scores = cls_scores * score_factors[..., None, :]
    cls_valid = cls_scores > score_thr
    if valid is not None:
        cls_valid = cls_valid & valid[..., None, :]
    labels = jnp.repeat(jnp.arange(fg, dtype=jnp.int32), n)
    return (cls_boxes.reshape(lead + (fg * n, 4)),
            cls_scores.reshape(lead + (fg * n,)),
            cls_valid.reshape(lead + (fg * n,)),
            labels)


def multiclass_nms_static_lanes(multi_bboxes: jnp.ndarray,
                                multi_scores: jnp.ndarray,
                                score_thr: float, iou_thr: float,
                                max_num: int,
                                valid: Optional[jnp.ndarray] = None,
                                score_factors: Optional[jnp.ndarray] = None,
                                tile: Optional[int] = None
                                ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray]:
    """B independent multiclass-NMS decodes in ONE shared pick loop.

    The batched-stream analogue of ``multiclass_nms_static``: vmapping that
    function lowers its while_loop to lockstep gathers (the measured 20×+
    vmap pathology — BASELINE.md), and unrolling B copies runs B sequential
    pick loops back to back.  One ``nms_static_lanes`` call over the union
    retires ``tile`` candidates per round across ALL lanes, so the
    sequential round count stays at a single image's while every round's
    vector work feeds the whole batch.  Exact per lane.

    Args:
        multi_bboxes: (B, N, 4) or (B, N, C*4).
        multi_scores: (B, N, C); column 0 is background and is skipped.
        valid: optional (B, N) mask for padded proposal rows.
        score_factors: optional (B, N) per-row score multipliers.

    Returns:
        dets: (B, max_num, 5) zero-padded; labels: (B, max_num) int32;
        mask: (B, max_num) bool.
    """
    flat_boxes, flat_scores, flat_valid, labels = _multiclass_candidates(
        multi_bboxes, multi_scores, score_thr, valid, score_factors)
    B = flat_scores.shape[0]
    cls_groups = jnp.broadcast_to(labels[None], (B,) + labels.shape)
    keep_idx, out_mask = nms_static_lanes(
        flat_boxes, flat_scores, iou_thr, max_num,
        valid=flat_valid, sup_groups=cls_groups, tile=tile)
    out_boxes = jnp.take_along_axis(
        flat_boxes, keep_idx[..., None], axis=1) * out_mask[..., None]
    out_scores = jnp.where(
        out_mask, jnp.take_along_axis(flat_scores, keep_idx, axis=1), 0.0)
    out_labels = jnp.where(out_mask, labels[keep_idx], 0)
    dets = jnp.concatenate([out_boxes, out_scores[..., None]], axis=-1)
    return dets, out_labels, out_mask
