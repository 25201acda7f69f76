"""Sampler variants (reference `mmdet/core/bbox/samplers/`, ~600 LoC):
PseudoSampler, InstanceBalancedPosSampler, IoUBalancedNegSampler,
CombinedSampler, forward-based OHEMSampler — expressed as fixed-shape
selection functions composable with `random_sample_and_target`.  The two
shipped configs exercise RandomSampler + OHEMHNLSampler (targets.py); these
variants complete the registry surface.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .targets import NEG_INF, AssignResult, _random_topk


def pseudo_sample(assign_result: AssignResult):
    """PseudoSampler: every assigned box kept, no subsampling
    (base for anchor-free heads)."""
    pos_mask = assign_result.gt_inds > 0
    neg_mask = assign_result.gt_inds == 0
    return pos_mask, neg_mask


def instance_balanced_pos_sample(rng: jax.Array, assign_result: AssignResult,
                                 num_expected: int, num_gts_max: int
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InstanceBalancedPosSampler: spread positives evenly across GT
    instances (instance_balanced_pos_sampler.py).

    Fixed-shape form: per-gt uniform priorities with a per-gt rank cap of
    ceil(num_expected / num_gts), then global top-k fill.
    """
    eligible = assign_result.gt_inds > 0
    gt_of = jnp.maximum(assign_result.gt_inds - 1, 0)
    noise = jax.random.uniform(rng, eligible.shape)
    per_gt_cap = -(-num_expected // max(num_gts_max, 1))
    # rank within each gt by noise
    score = jnp.where(eligible, noise, NEG_INF)
    onehot = jax.nn.one_hot(gt_of, num_gts_max, dtype=jnp.float32)
    # rank_i = #{j: same gt, noise_j > noise_i}
    better = (score[None, :] > score[:, None]) & eligible[None, :]
    same_gt = gt_of[None, :] == gt_of[:, None]
    rank_in_gt = (better & same_gt).sum(axis=1)
    capped = eligible & (rank_in_gt < per_gt_cap)
    # fill remaining quota from the uncapped eligible set
    fill_score = jnp.where(capped, 2.0 + noise,
                           jnp.where(eligible, noise, NEG_INF))
    vals, idx = jax.lax.top_k(fill_score, num_expected)
    return idx.astype(jnp.int32), vals > NEG_INF / 2


def iou_balanced_neg_sample(rng: jax.Array, assign_result: AssignResult,
                            num_expected: int, floor_thr: float = -1.0,
                            floor_fraction: float = 0.0, num_bins: int = 3,
                            neg_iou_thr: float = 0.5
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IoUBalancedNegSampler (iou_balanced_neg_sampler.py, Libra R-CNN):
    negatives drawn uniformly across IoU bins in [floor, thr)."""
    eligible = assign_result.gt_inds == 0
    iou = assign_result.max_overlaps
    lo = max(floor_thr, 0.0)
    width = max(neg_iou_thr - lo, 1e-6) / num_bins
    bin_of = jnp.clip(((iou - lo) / width).astype(jnp.int32), 0, num_bins - 1)
    noise = jax.random.uniform(rng, eligible.shape)
    # rank within bin; round-robin across bins via rank-major score
    score = jnp.where(eligible, noise, NEG_INF)
    better = (score[None, :] > score[:, None]) & eligible[None, :]
    same_bin = bin_of[None, :] == bin_of[:, None]
    rank_in_bin = (better & same_bin).sum(axis=1)
    priority = jnp.where(eligible, -rank_in_bin.astype(jnp.float32) + noise,
                         NEG_INF)
    vals, idx = jax.lax.top_k(priority, num_expected)
    return idx.astype(jnp.int32), vals > NEG_INF / 2


def random_neg_sample(rng: jax.Array, assign_result: AssignResult,
                      num_expected: int):
    return _random_topk(rng, assign_result.gt_inds == 0, num_expected)


def random_pos_sample(rng: jax.Array, assign_result: AssignResult,
                      num_expected: int):
    return _random_topk(rng, assign_result.gt_inds > 0, num_expected)


def combined_sample(rng: jax.Array, assign_result: AssignResult,
                    num: int, pos_fraction: float,
                    pos_strategy: str = "instance_balanced",
                    neg_strategy: str = "iou_balanced",
                    num_gts_max: int = 32):
    """CombinedSampler: independent pos/neg strategies
    (combined_sampler.py)."""
    k_pos = int(num * pos_fraction)
    r1, r2 = jax.random.split(rng)
    if pos_strategy == "instance_balanced":
        pos_idx, pos_ok = instance_balanced_pos_sample(r1, assign_result,
                                                       k_pos, num_gts_max)
    else:
        pos_idx, pos_ok = random_pos_sample(r1, assign_result, k_pos)
    n_pos = pos_ok.sum()
    if neg_strategy == "iou_balanced":
        neg_idx, neg_ok = iou_balanced_neg_sample(r2, assign_result, num)
    else:
        neg_idx, neg_ok = random_neg_sample(r2, assign_result, num)
    # keep (num − n_pos) negatives
    neg_rank = jnp.cumsum(neg_ok.astype(jnp.int32)) - 1
    neg_ok = neg_ok & (neg_rank < num - n_pos)
    return (pos_idx, pos_ok), (neg_idx, neg_ok)


def ohem_forward_sample(loss_per_candidate: jnp.ndarray,
                        assign_result: AssignResult,
                        num: int, pos_fraction: float):
    """Forward-based OHEMSampler (ohem_sampler.py): hardest by per-candidate
    loss (the loss is computed by the caller with a no-grad head pass)."""
    k_pos = int(num * pos_fraction)
    pos_elig = assign_result.gt_inds > 0
    neg_elig = assign_result.gt_inds == 0
    pos_loss = jnp.where(pos_elig, loss_per_candidate, NEG_INF)
    pos_vals, pos_idx = jax.lax.top_k(pos_loss, k_pos)
    pos_ok = pos_vals > NEG_INF / 2
    n_pos = pos_ok.sum()
    neg_loss = jnp.where(neg_elig, loss_per_candidate, NEG_INF)
    neg_vals, neg_idx = jax.lax.top_k(neg_loss, num)
    neg_rank = jnp.cumsum((neg_vals > NEG_INF / 2).astype(jnp.int32)) - 1
    neg_ok = (neg_vals > NEG_INF / 2) & (neg_rank < num - n_pos)
    return (pos_idx.astype(jnp.int32), pos_ok), \
        (neg_idx.astype(jnp.int32), neg_ok)
