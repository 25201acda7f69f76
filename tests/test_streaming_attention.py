"""Streaming-softmax accumulator ops vs a direct-softmax numpy oracle.

Simulates a sliding window: keys arrive/depart frame by frame with random
validity masks; after every slide, `finalize` must equal the softmax computed
from scratch over the live key set — for surviving rows (whose accumulators
went through evict/insert chains) AND for fresh rows (init_rows).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvrnet_tpu.ops.streaming_attention import (acc_init, evict, finalize,
                                                init_rows, insert)

jax.config.update("jax_platforms", "cpu")


def direct(q, k, v, mask, scale):
    s = (q @ k.T) * scale
    s = np.where(mask[None, :], s, -np.inf)
    with np.errstate(over="ignore"):
        m = s.max(axis=1, keepdims=True)
        m = np.where(np.isfinite(m), m, 0.0)
        p = np.where(mask[None, :], np.exp(s - m), 0.0)
    l = p.sum(axis=1, keepdims=True)
    return np.where(l > 0, (p @ v) / np.maximum(l, 1e-30), 0.0)


@pytest.mark.parametrize("seed, logit_scale, tol", [
    (0, 1.0, 5e-5),    # realistic logit spread (±3): drift ~ rounding level
    (1, 1.0, 5e-5),
    (0, 2.0, 2e-3),    # adversarial spread (±12): eviction of a dominant key
                       # cancels catastrophically — error ∝ ε·(evicted mass /
                       # remaining mass), bounded by the ≤T-step row lifetime
])
def test_streaming_matches_direct_over_slides(seed, logit_scale, tol):
    T, P, D = 5, 7, 16
    steps = 3 * T          # several full window turnovers
    rng = np.random.default_rng(seed)
    scale = 1.0 / np.sqrt(D)

    frames = []            # list of (q, k, v, mask) per frame, newest last
    acc = None             # accumulators for the rows of `frames`, same order

    for step in range(steps):
        qn = rng.normal(size=(P, D)).astype(np.float32) * logit_scale
        kn = rng.normal(size=(P, D)).astype(np.float32) * logit_scale
        vn = rng.normal(size=(P, D)).astype(np.float32)
        mn = rng.random(P) > 0.3
        if step == 2:      # exercise the all-masked-frame edge
            mn[:] = False

        if len(frames) == T:      # evict oldest
            _, k_dep, v_dep, m_dep = frames.pop(0)
            q_live = np.concatenate([f[0] for f in frames], axis=0)
            acc = {k: v[P:] for k, v in acc.items()}      # drop departing rows
            acc = evict(acc, jnp.asarray(q_live), jnp.asarray(k_dep),
                        jnp.asarray(v_dep), jnp.asarray(m_dep), scale)

        if frames:
            q_live = np.concatenate([f[0] for f in frames], axis=0)
            acc, _ = insert(acc, jnp.asarray(q_live), jnp.asarray(kn),
                            jnp.asarray(vn), jnp.asarray(mn), scale)

        frames.append((qn, kn, vn, mn))
        k_all = np.concatenate([f[1] for f in frames], axis=0)
        v_all = np.concatenate([f[2] for f in frames], axis=0)
        m_all = np.concatenate([f[3] for f in frames], axis=0)
        fresh = init_rows(jnp.asarray(qn), jnp.asarray(k_all),
                          jnp.asarray(v_all), jnp.asarray(m_all), scale)
        if acc is None or len(frames) == 1:
            acc = fresh
        else:
            acc = {k: jnp.concatenate([acc[k], fresh[k]], axis=0)
                   for k in acc}

        q_all = np.concatenate([f[0] for f in frames], axis=0)
        want = direct(q_all, k_all, v_all, m_all, scale)
        got = np.asarray(finalize(acc))
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol,
                                   err_msg=f"step {step}")


def test_repair_recovers_underflowed_mass():
    """When a hugely dominant key departs, every other contribution has
    underflowed under the high anchor and the row's mass collapses — the
    health table must flag it and `repair`'s lax.cond rebuild must restore
    the exact softmax (the scenario that silently zeroed attention outputs
    before the repair machinery existed)."""
    from hvrnet_tpu.ops.streaming_attention import (degenerate_rows, insert,
                                                    repair)
    P, D, T = 4, 8, 2
    rng = np.random.default_rng(0)
    scale = 1.0
    q = jnp.asarray(rng.normal(size=(2 * P, D)).astype(np.float32))
    # frame A: one key aligned with every query at huge magnitude
    kA = jnp.asarray(np.concatenate(
        [np.asarray(q[:1]) * 200.0, rng.normal(size=(P - 1, D))],
        axis=0).astype(np.float32))
    vA = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    kB = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    vB = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    ones = jnp.ones((P,), bool)

    k_all = jnp.concatenate([kA, kB])
    v_all = jnp.concatenate([vA, vB])
    acc, MA = init_rows(q, k_all, v_all, jnp.ones((2 * P,), bool), scale,
                        slots=T)
    # slide: frame A departs, frame C arrives
    kC = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    vC = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    acc = evict(acc, q, kA, vA, ones, scale)
    acc, col = insert(acc, q, kC, vC, ones, scale)
    M = MA.at[:, 0].set(col)     # slot 0 now holds frame C's column
    assert bool(degenerate_rows(acc, M).any()), \
        "dominant-key eviction must be flagged"

    k_live = jnp.concatenate([kC, kB])
    v_live = jnp.concatenate([vC, vB])
    fixed, M2 = repair(acc, M, q, k_live, v_live, jnp.ones((2 * P,), bool),
                       scale, T)
    want = direct(np.asarray(q), np.asarray(k_live), np.asarray(v_live),
                  np.ones(2 * P, bool), scale)
    np.testing.assert_allclose(np.asarray(finalize(fixed)), want,
                               rtol=1e-5, atol=1e-5)
    assert not bool(degenerate_rows(fixed, M2).any())
