"""Assignment, sampling and target computation — fixed-shape, mask-based.

Re-implements the semantics of
  * `MaxIoUAssigner.assign_wrt_overlaps`
    (`/root/reference/mmdet/core/bbox/assigners/max_iou_assigner.py:114-174`)
  * `RandomSampler` (`random_sampler.py`) with `add_gt_as_proposals`
  * `bbox_target` (`/root/reference/mmdet/core/bbox/bbox_target.py`)
  * `anchor_target` (`/root/reference/mmdet/core/anchor/anchor_target.py`)
  * `OHEMHNLSampler.get_ohem_weights` (`ohem_hnl_sampler.py:83-115`)

as pure jnp functions with STATIC shapes: variable-size index sets become
boolean masks + fixed-size top-k selections.  Random subset sampling uses the
uniform-priority top-k trick (eligible items get iid U(0,1) priorities; the
k largest are a uniform random k-subset), which reproduces the reference's
`np.random.shuffle`-based sampling in distribution.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox2delta, bbox_overlaps

NEG_INF = -1e30


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray       # (N,) int32: -1 ignore, 0 neg, i+1 → gt i
    max_overlaps: jnp.ndarray  # (N,) float32
    labels: jnp.ndarray        # (N,) int32 (0 where not positive)


def max_iou_assign(bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                   gt_mask: jnp.ndarray, gt_labels: Optional[jnp.ndarray],
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float,
                   box_mask: Optional[jnp.ndarray] = None,
                   gt_max_assign_all: bool = True,
                   overlaps: Optional[jnp.ndarray] = None) -> AssignResult:
    """`assign_wrt_overlaps` with validity masks for padded gts/boxes.

    `overlaps` optionally supplies a precomputed (G, N) IoU matrix — used by
    the approx-max-IoU assignment of guided anchoring
    (reference approx_max_iou_assigner.py:51-115, which maxes candidate IoUs
    over each square's approx group before the standard assignment rules).
    """
    G = gt_bboxes.shape[0]
    if overlaps is None:
        overlaps = bbox_overlaps(gt_bboxes, bboxes)           # (G, N)
    overlaps = jnp.where(gt_mask[:, None], overlaps, -1.0)
    if box_mask is not None:
        overlaps = jnp.where(box_mask[None, :], overlaps, -1.0)

    max_overlaps = overlaps.max(axis=0)
    argmax_overlaps = overlaps.argmax(axis=0)

    assigned = jnp.full(bboxes.shape[0], -1, jnp.int32)
    assigned = jnp.where((max_overlaps >= 0) & (max_overlaps < neg_iou_thr),
                         0, assigned)
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)

    # step 4: each gt claims its best proposal(s); later gts override
    # (max_iou_assigner.py:155-162).
    gt_max = overlaps.max(axis=1)
    def body(i, a):
        claim = gt_mask[i] & (gt_max[i] >= min_pos_iou)
        if gt_max_assign_all:
            rows = overlaps[i] == gt_max[i]
        else:
            rows = jnp.arange(a.shape[0]) == overlaps[i].argmax()
        return jnp.where(claim & rows, i + 1, a)
    assigned = jax.lax.fori_loop(0, G, body, assigned)
    if box_mask is not None:
        assigned = jnp.where(box_mask, assigned, -1)

    if gt_labels is not None:
        pos = assigned > 0
        lab = jnp.where(pos, gt_labels[jnp.maximum(assigned - 1, 0)], 0)
    else:
        lab = jnp.zeros_like(assigned)
    return AssignResult(assigned, max_overlaps, lab.astype(jnp.int32))


def _random_topk(rng: jax.Array, eligible: jnp.ndarray, k: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly pick min(k, #eligible) items; returns (idx (k,), mask (k,))."""
    noise = jax.random.uniform(rng, eligible.shape)
    priority = jnp.where(eligible, noise, NEG_INF)
    vals, idx = jax.lax.top_k(priority, k)
    return idx.astype(jnp.int32), vals > NEG_INF / 2


class SampleResult(NamedTuple):
    rois: jnp.ndarray           # (num, 4) sampled boxes
    labels: jnp.ndarray         # (num,) int32 gt label (0 = bg)
    label_weights: jnp.ndarray  # (num,) float32
    bbox_targets: jnp.ndarray   # (num, 4)
    bbox_weights: jnp.ndarray   # (num, 4)
    valid: jnp.ndarray          # (num,) bool — False ⇒ padded slot
    pos_mask: jnp.ndarray       # (num,) bool
    gt_inds: jnp.ndarray        # (num,) int32 assigned-gt row (0-clamped; only
                                #   meaningful where pos_mask)


def random_sample_and_target(rng: jax.Array,
                             proposals: jnp.ndarray,
                             proposal_mask: jnp.ndarray,
                             gt_bboxes: jnp.ndarray,
                             gt_mask: jnp.ndarray,
                             gt_labels: jnp.ndarray,
                             num: int,
                             pos_fraction: float,
                             add_gt_as_proposals: bool = True,
                             pos_iou_thr: float = 0.5,
                             neg_iou_thr: float = 0.5,
                             min_pos_iou: float = 0.5,
                             target_means=(0., 0., 0., 0.),
                             target_stds=(0.1, 0.1, 0.2, 0.2),
                             pos_weight: float = -1.0) -> SampleResult:
    """assign → random-sample → bbox_target, fused and fixed-shape.

    Equivalent to the reference chain at `selsa_rcnn.py:151-206`
    (MaxIoUAssigner → RandomSampler(add_gt) → get_target/bbox_target), with
    positives occupying the leading slots as in `bbox_target_single`.
    """
    if add_gt_as_proposals:
        cand = jnp.concatenate([gt_bboxes[:, :4], proposals[:, :4]], axis=0)
        cand_mask = jnp.concatenate([gt_mask, proposal_mask], axis=0)
    else:
        cand = proposals[:, :4]
        cand_mask = proposal_mask

    ar = max_iou_assign(cand, gt_bboxes, gt_mask, gt_labels,
                        pos_iou_thr, neg_iou_thr, min_pos_iou,
                        box_mask=cand_mask)

    k_pos = int(num * pos_fraction)
    rng_pos, rng_neg = jax.random.split(rng)
    eligible_pos = ar.gt_inds > 0
    # rank positives by iid noise; the first k_pos win
    pos_noise = jnp.where(eligible_pos,
                          jax.random.uniform(rng_pos, eligible_pos.shape), NEG_INF)
    pos_rank = jnp.argsort(jnp.argsort(-pos_noise))
    chosen_pos = eligible_pos & (pos_rank < k_pos)
    # combined score: chosen positives first, then random negatives
    neg_noise = jax.random.uniform(rng_neg, eligible_pos.shape)
    score = jnp.where(chosen_pos, 2.0 + pos_noise,
                      jnp.where(ar.gt_inds == 0, neg_noise, NEG_INF))
    vals, idx = jax.lax.top_k(score, num)
    valid = vals > NEG_INF / 2
    pos_sel = vals > 1.5

    rois = cand[idx] * valid[:, None]
    gi = jnp.maximum(ar.gt_inds[idx] - 1, 0)
    labels = jnp.where(pos_sel, gt_labels[gi], 0).astype(jnp.int32)
    pw = 1.0 if pos_weight <= 0 else pos_weight
    label_weights = jnp.where(pos_sel, pw, jnp.where(valid, 1.0, 0.0))
    targets = bbox2delta(rois, gt_bboxes[gi][:, :4], target_means, target_stds)
    bbox_targets = jnp.where(pos_sel[:, None], targets, 0.0)
    bbox_weights = jnp.where(pos_sel[:, None], 1.0, 0.0)
    return SampleResult(rois, labels, label_weights, bbox_targets,
                        bbox_weights, valid, pos_sel, gi.astype(jnp.int32))


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray          # (A,) int32
    label_weights: jnp.ndarray   # (A,)
    bbox_targets: jnp.ndarray    # (A, 4)
    bbox_weights: jnp.ndarray    # (A, 4)
    num_total_samples: jnp.ndarray  # scalar


def anchor_target_single(rng: jax.Array,
                         anchors: jnp.ndarray,
                         valid_flags: jnp.ndarray,
                         gt_bboxes: jnp.ndarray,
                         gt_mask: jnp.ndarray,
                         img_shape: jnp.ndarray,
                         cfg: dict,
                         target_means=(0., 0., 0., 0.),
                         target_stds=(1., 1., 1., 1.)) -> AnchorTargets:
    """`anchor_target_single` (anchor_target.py:94-159) for one image.

    anchors: (A, 4) the full static grid; eligibility = valid_flags ∧ inside
    the (dynamic-valued) img_shape with `allowed_border`
    (anchor_target.py:162-175).  Outputs are full-A maps, i.e. the reference
    after its `unmap` step.
    """
    border = float(cfg.get("allowed_border", 0))
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    if border >= 0:
        inside = (valid_flags
                  & (anchors[:, 0] >= -border) & (anchors[:, 1] >= -border)
                  & (anchors[:, 2] < w + border) & (anchors[:, 3] < h + border))
    else:
        inside = valid_flags

    acfg = cfg["assigner"]
    ar = max_iou_assign(anchors, gt_bboxes, gt_mask, None,
                        float(acfg["pos_iou_thr"]), float(acfg["neg_iou_thr"]),
                        float(acfg["min_pos_iou"]), box_mask=inside)

    scfg = cfg["sampler"]
    num = int(scfg["num"])
    k_pos = int(num * float(scfg["pos_fraction"]))
    rng_pos, rng_neg = jax.random.split(rng)
    eligible_pos = ar.gt_inds > 0
    pos_noise = jnp.where(eligible_pos,
                          jax.random.uniform(rng_pos, eligible_pos.shape), NEG_INF)
    pos_rank = jnp.argsort(jnp.argsort(-pos_noise))
    chosen_pos = eligible_pos & (pos_rank < k_pos)
    n_pos = chosen_pos.sum()

    eligible_neg = ar.gt_inds == 0
    neg_noise = jnp.where(eligible_neg,
                          jax.random.uniform(rng_neg, eligible_neg.shape), NEG_INF)
    neg_rank = jnp.argsort(jnp.argsort(-neg_noise))
    chosen_neg = eligible_neg & (neg_rank < num - n_pos)
    n_neg = chosen_neg.sum()

    gi = jnp.maximum(ar.gt_inds - 1, 0)
    labels = jnp.where(chosen_pos, 1, 0).astype(jnp.int32)
    pos_weight = float(cfg.get("pos_weight", -1))
    pw = 1.0 if pos_weight <= 0 else pos_weight
    label_weights = jnp.where(chosen_pos, pw,
                              jnp.where(chosen_neg, 1.0, 0.0))
    t = bbox2delta(anchors, gt_bboxes[gi][:, :4], target_means, target_stds)
    bbox_targets = jnp.where(chosen_pos[:, None], t, 0.0)
    bbox_weights = jnp.where(chosen_pos[:, None], 1.0, 0.0)
    num_total = (jnp.maximum(n_pos, 1) + jnp.maximum(n_neg, 1)).astype(jnp.float32)
    return AnchorTargets(labels, label_weights, bbox_targets, bbox_weights,
                         num_total)


def ohem_weights(labels: jnp.ndarray, label_weights: jnp.ndarray,
                 bbox_weights: jnp.ndarray, loss_per_roi: jnp.ndarray,
                 valid: jnp.ndarray, num: int, pos_fraction: float):
    """`OHEMHNLSampler.get_ohem_weights` (ohem_hnl_sampler.py:83-115).

    Re-weights a pre-sampled RoI set to its `num` hardest members: top
    num·pos_fraction positives by loss, negatives fill the remainder.
    Returns (label_weights, bbox_weights, selected_mask, pos_selected_mask).
    """
    k_pos = int(num * pos_fraction)
    pos_elig = (labels > 0) & valid
    neg_elig = (labels == 0) & valid
    pos_loss = jnp.where(pos_elig, loss_per_roi, NEG_INF)
    pos_rank = jnp.argsort(jnp.argsort(-pos_loss))
    chosen_pos = pos_elig & (pos_rank < k_pos)
    score = jnp.where(chosen_pos, 1e9 + loss_per_roi,
                      jnp.where(neg_elig, loss_per_roi, NEG_INF))
    vals, idx = jax.lax.top_k(score, num)
    sel = jnp.zeros_like(labels, dtype=bool).at[idx].set(vals > NEG_INF / 2)
    pos_sel = sel & chosen_pos
    new_lw = jnp.where(sel, 1.0, 0.0)
    new_bw = jnp.where(pos_sel[:, None], 1.0, 0.0) * jnp.ones_like(bbox_weights)
    return new_lw, new_bw, sel, pos_sel
