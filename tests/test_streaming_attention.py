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


@pytest.mark.parametrize("seed, logit_scale", [(0, 1.0), (1, 1.0), (2, 2.0)])
def test_slide_equals_evict_then_insert(seed, logit_scale):
    """`slide` (the fused one-pass update both stream_update and
    stream_forward now use) must match the evict→insert composition it
    replaced, including masked keys, the −inf empty-row anchor, and the
    adversarial cancellation regime (logit_scale=2)."""
    from hvrnet_tpu.ops.streaming_attention import slide
    R, P, D = 23, 7, 16
    rng = np.random.default_rng(seed)
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32) * logit_scale)
    k_dep = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32) * logit_scale)
    v_dep = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    k_new = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32) * logit_scale)
    v_new = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    m_dep = jnp.asarray(rng.random(P) > 0.3)
    m_new = jnp.asarray(rng.random(P) > 0.3)
    # accumulators holding the departing keys (plus background mass)
    k_bg = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32) * logit_scale)
    v_bg = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    acc = init_rows(q, jnp.concatenate([k_dep, k_bg]),
                    jnp.concatenate([v_dep, v_bg]),
                    jnp.concatenate([m_dep, jnp.ones((P,), bool)]), scale)

    ref = evict(dict(acc), q, k_dep, v_dep, m_dep, scale)
    ref, ref_col = insert(ref, q, k_new, v_new, m_new, scale)
    got, got_col = slide(dict(acc), q, k_dep, v_dep, m_dep,
                         k_new, v_new, m_new, scale)
    np.testing.assert_allclose(np.asarray(got_col), np.asarray(ref_col))
    for key in ("m", "l", "a"):
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(ref[key]),
                                   rtol=2e-6, atol=2e-6, err_msg=key)
    # finalized outputs also match a from-scratch softmax over the live set
    k_live = jnp.concatenate([k_new, k_bg])
    v_live = jnp.concatenate([v_new, v_bg])
    m_live = jnp.concatenate([m_new, jnp.ones((P,), bool)])
    want = direct(np.asarray(q), np.asarray(k_live), np.asarray(v_live),
                  np.asarray(m_live), scale)
    np.testing.assert_allclose(np.asarray(finalize(got)), want,
                               rtol=5e-3, atol=5e-3)


def test_slide_from_empty_rows_matches_insert_only():
    """The prefill case: rows whose accumulators are empty (m = −inf,
    l = a = 0) slide with an all-False departing mask — the fused pass must
    hit the neginf anchor guard (no NaNs) and equal a pure insert."""
    from hvrnet_tpu.ops.streaming_attention import slide
    R, P, D = 11, 7, 16
    rng = np.random.default_rng(3)
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    k_dep = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    v_dep = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    k_new = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    m_new = jnp.asarray(rng.random(P) > 0.3)
    acc = acc_init(R, D)
    got, _ = slide(dict(acc), q, k_dep, v_dep, jnp.zeros((P,), bool),
                   k_new, v_new, m_new, scale)
    ref, _ = insert(acc_init(R, D), q, k_new, v_new, m_new, scale)
    for key in ("m", "l", "a"):
        arr = np.asarray(got[key])
        assert not np.any(np.isnan(arr)), key
        np.testing.assert_allclose(arr, np.asarray(ref[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


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
