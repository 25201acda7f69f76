"""Streaming-softmax accumulators for sliding-window attention.

The reference's video heads recompute full O(N²) attention over the whole
T-frame proposal cache for every output frame (e.g. 63×300 = 18,900 tokens
through four non-local blocks, `/root/reference/tools/hnl_test.py:309-475`).
On TPU the flash kernel already runs at the chip's matmul ceiling
(~170 TFLOPS measured on v5e), so recomputation cannot get faster — but it
is also unnecessary: the blocks whose queries/keys are row-wise functions of
per-frame cached features (SELSA NL1; HRNMP NL1 and the non-key rows of NL3)
have *pairwise-stationary* logits as the window slides.  Instead of the
logits, we keep the softmax in streaming form — the same (m, l, acc) triple
flash attention carries per q-tile, persisted per query row across frames:

    m_i  = anchor (running max) of scaled logits seen by row i   (R,)
    l_i  = Σ_j exp(s_ij − m_i)   over the live key set           (R,)
    a_i  = Σ_j exp(s_ij − m_i) · v_j                              (R, D)
    out_i = a_i / l_i

When the window slides, one frame's P keys leave and P enter: `evict`
subtracts the departing contributions, `insert` adds the new ones (rescaling
by exp(m_old − m_new) if the max grows), and `init_rows` builds fresh
accumulators for the arriving frame's query rows with one (P, R) pass.
Per-step cost drops from O(R²·D) to O(R·P·D).

Numerics — the eviction problem and its repair.  Eviction is exact in real
arithmetic (contributions were added under the same anchor, up to uniform
rescales), but float32 is not real arithmetic:

  * underflow: a contribution inserted while a much larger key held the
    anchor (s < m − 87) flushes to zero and is unrecoverable if the dominant
    key later departs;
  * cancellation: subtracting a contribution that carries most of a row's
    mass amplifies the remaining mass's relative error by
    evicted/remaining ≈ e^gap · ε.

Both failure modes are visible in one scalar per row: the gap between the
stored anchor m_i and the true current max logit.  `slot_max` therefore
tracks per-(row, slot) logit maxima — an (R, T) float32 table, trivial
memory — and `repair` rebuilds ALL accumulators exactly (one (R, R) pass,
i.e. one exact-attention block) under a `lax.cond` whenever any row's gap
exceeds ``theta`` nats or its l is non-positive/tiny.  With trained weights
a >10-nat drop from evicting ONE key (softmax weight ratio > 22000:1 over a
≥6000-key set) is vanishingly rare, so the steady state stays O(R·P·D);
with adversarial inputs the cond keeps results exact at the cost of an
occasional full block.  Residual relative error between repairs is bounded
by e^theta · ε ≈ 4e-4.

All functions are mask-aware: invalid keys contribute exactly zero, matching
the −∞ additive bias of the exact path (`ops/attention.py`).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# plain Python floats: this module is first imported from inside traced head
# methods, so module-level jnp scalars would be created UNDER the trace and
# leak tracers into every later jaxpr as poisoned constants
TINY = 1e-30
THETA = 10.0      # anchor-gap (nats) beyond which a row must be rebuilt
L_FLOOR = 1e-6    # healthy l is ≥ e^-THETA ≈ 4.5e-5; below this = corrupted


def acc_init(rows: int, d: int) -> Dict[str, jnp.ndarray]:
    """Empty accumulators for ``rows`` query rows with value width ``d``."""
    return dict(m=jnp.full((rows,), -jnp.inf, jnp.float32),
                l=jnp.zeros((rows,), jnp.float32),
                a=jnp.zeros((rows, d), jnp.float32))


def _logits(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    return jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale


def evict(acc: Dict, q: jnp.ndarray, k_dep: jnp.ndarray, v_dep: jnp.ndarray,
          mask_dep: jnp.ndarray, scale: float) -> Dict:
    """Remove the departing keys' contributions from every row.

    q: (R, Dk) the rows' STATIONARY queries; k_dep/v_dep: (P, Dk)/(P, Dv);
    mask_dep: (P,).  Exact inverse of the corresponding `insert` modulo the
    uniform rescales applied since (see module docstring for the float32
    failure modes `repair` handles).
    """
    s = _logits(q, k_dep, scale)                          # (R, P)
    w = jnp.where(mask_dep[None, :],
                  jnp.exp(s - acc["m"][:, None]), 0.0)
    return dict(m=acc["m"],
                l=acc["l"] - w.sum(axis=1),
                a=acc["a"] - jnp.dot(w, v_dep.astype(jnp.float32),
                                     preferred_element_type=jnp.float32))


def insert(acc: Dict, q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
           mask_new: jnp.ndarray, scale: float
           ) -> Tuple[Dict, jnp.ndarray]:
    """Add the arriving keys' contributions to every row (rescaling on a new
    running max — the same update flash attention applies per k-tile).

    Returns (acc, col_max) where col_max (R,) = each row's max masked logit
    against the NEW keys — the arriving slot's column of the `slot_max`
    health table.
    """
    s = _logits(q, k_new, scale)                          # (R, P)
    s = jnp.where(mask_new[None, :], s, -jnp.inf)
    col_max = s.max(axis=1)
    m_new = jnp.maximum(acc["m"], col_max)
    # r: exp(-inf − -inf) would be NaN; both-empty rows stay empty via the 0.
    r = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(acc["m"] - m_new))
    p = jnp.where(mask_new[None, :], jnp.exp(s - m_new[:, None]), 0.0)
    acc = dict(m=m_new,
               l=acc["l"] * r + p.sum(axis=1),
               a=acc["a"] * r[:, None]
                 + jnp.dot(p, v_new.astype(jnp.float32),
                           preferred_element_type=jnp.float32))
    return acc, col_max


def slide(acc: Dict, q: jnp.ndarray,
          k_dep: jnp.ndarray, v_dep: jnp.ndarray, mask_dep: jnp.ndarray,
          k_new: jnp.ndarray, v_new: jnp.ndarray, mask_new: jnp.ndarray,
          scale: float) -> Tuple[Dict, jnp.ndarray]:
    """`evict` + `insert` composed into ONE accumulator pass.

    Algebraically identical to ``insert(evict(acc, …), …)`` — the eviction
    weights are taken against the OLD anchor and the combined rescale is
    applied once — but the (R, D) accumulator is read and written a single
    time instead of twice (the a-array is 25.8 MB f32 at the 21×300 point;
    77 MB at 63×300).  XLA fuses this expression to ~HBM roofline (94 µs at
    21×300 on v5e, chained measurement); a hand-written Pallas version was
    only ~17% faster at its best tile and not worth the platform divergence
    (BASELINE.md round 3).  Returns (acc, col_max) like `insert`.
    """
    s_dep = _logits(q, k_dep, scale)                      # (R, P)
    w = jnp.where(mask_dep[None, :],
                  jnp.exp(s_dep - acc["m"][:, None]), 0.0)
    s_new = _logits(q, k_new, scale)                      # (R, P)
    s_new = jnp.where(mask_new[None, :], s_new, -jnp.inf)
    col_max = s_new.max(axis=1)
    m_new = jnp.maximum(acc["m"], col_max)
    r = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(acc["m"] - m_new))
    p = jnp.where(mask_new[None, :], jnp.exp(s_new - m_new[:, None]), 0.0)
    acc = dict(
        m=m_new,
        l=(acc["l"] - w.sum(axis=1)) * r + p.sum(axis=1),
        a=(acc["a"] - jnp.dot(w, v_dep.astype(jnp.float32),
                              preferred_element_type=jnp.float32))
          * r[:, None]
          + jnp.dot(p, v_new.astype(jnp.float32),
                    preferred_element_type=jnp.float32))
    return acc, col_max


def init_rows(q_new: jnp.ndarray, k_all: jnp.ndarray, v_all: jnp.ndarray,
              mask_all: jnp.ndarray, scale: float, slots: int = 0,
              slot_rows: int = 0):
    """Fresh accumulators for query rows over the full live key set.

    q_new: (P, Dk); k_all/v_all: (R, Dk)/(R, Dv); mask_all: (R,).
    With ``slots`` > 0 the keys are taken as slot-major contiguous blocks of
    R // slots rows and the per-slot logit maxima (P, slots) are also
    returned (the new rows' `slot_max` entries).  ``slot_rows`` bounds the
    slot-covered key prefix when the arrays carry a flash-tile pad tail
    beyond the T·P grid (the tail is always masked, so it never contributes
    to accumulators and carries no slot identity).
    """
    s = _logits(q_new, k_all, scale)                      # (P, R)
    s = jnp.where(mask_all[None, :], s, -jnp.inf)
    m = s.max(axis=1)
    p = jnp.where(mask_all[None, :], jnp.exp(s - m[:, None]), 0.0)
    acc = dict(m=m, l=p.sum(axis=1),
               a=jnp.dot(p, v_all.astype(jnp.float32),
                         preferred_element_type=jnp.float32))
    if not slots:
        return acc
    cov = slot_rows or s.shape[1]
    slot_max = s[:, :cov].reshape(s.shape[0], slots, -1).max(axis=2)
    return acc, slot_max


def finalize(acc: Dict) -> jnp.ndarray:
    """(R, D) attention outputs; rows with an empty key set emit zeros."""
    return acc["a"] / jnp.maximum(acc["l"], TINY)[:, None]


def degenerate_rows(acc: Dict, slot_max: jnp.ndarray,
                    theta: float = THETA,
                    l_floor: float = L_FLOOR) -> jnp.ndarray:
    """(R,) bool — rows whose accumulators can no longer be trusted:
    the anchor sits > theta nats above the true max live logit (underflow /
    cancellation amplification — module docstring), the mass collapsed, or
    the true max is gone entirely while the anchor remains."""
    m_true = slot_max.max(axis=1)
    alive = jnp.isfinite(acc["m"])
    return alive & (~jnp.isfinite(m_true)
                    | (acc["m"] - m_true > theta)
                    | (acc["l"] <= l_floor)
                    | ~jnp.isfinite(acc["l"]))


def repair(acc: Dict, slot_max: jnp.ndarray, q_all: jnp.ndarray,
           k_all: jnp.ndarray, v_all: jnp.ndarray, mask_all: jnp.ndarray,
           scale: float, slots: int,
           theta: float = THETA,
           slot_rows: int = 0) -> Tuple[Dict, jnp.ndarray]:
    """Exact full rebuild of every row's accumulators — under a `lax.cond`,
    so the (R, R) pass only executes when `degenerate_rows` flags any row.

    The optimization_barrier pins the caller's accumulator computation
    OUTSIDE the cond — without it XLA sinks producer work into the
    pass-through branch (its results' only consumer), where it serializes
    behind the predicate instead of overlapping (profiled at ~0.4 ms/step
    of conditional time at the 63×300 point)."""
    acc, slot_max = jax.lax.optimization_barrier((acc, slot_max))
    bad = degenerate_rows(acc, slot_max, theta)

    def rebuild(_):
        return init_rows(q_all, k_all, v_all, mask_all, scale, slots=slots,
                         slot_rows=slot_rows)

    def keep(_):
        return acc, slot_max

    return jax.lax.cond(bad.any(), rebuild, keep, None)
