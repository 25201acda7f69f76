"""Streaming-ring HNMB engine ≡ exact full-recompute window path.

The streaming ring (engine/detector.py HNMBRCNN.stream) carries softmax
accumulators across frames instead of recomputing the O(N²) window attention
(ops/streaming_attention.py); detections must match the exact `ring_step`
path over a whole video — including warmup front-padding, steady state with
several full ring turnovers, and the tail drain.
"""
import numpy as np
import jax

from hvrnet_tpu.engine import HNMBRCNN, SlidingWindowRunner
from tests.test_engine_hnmb import tiny_hnmb_cfg
from tests.test_engine_selsa import synthetic_stream


def run(engine, params, n, branch=-1):
    runner = SlidingWindowRunner(engine, params, branch=branch)
    return runner.run(synthetic_stream(n), num_frames=n)


def test_streaming_matches_exact_ring():
    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=2, proposals=8)
    test_cfg["bbox_head"]["t_dim"] = 5
    test_cfg["bbox_head"]["key_dim"] = 2
    exact = HNMBRCNN(model_cfg, None, test_cfg)
    params = exact.init_params(jax.random.PRNGKey(0))

    stream = HNMBRCNN(model_cfg, None, test_cfg)
    stream.stream = True

    n = 13                      # > 2 window turnovers at T=5
    for branch in (-1, 0):
        want = run(exact, params, n, branch=branch)
        got = run(stream, params, n, branch=branch)
        assert len(want) == len(got) == n
        for i, (a, b) in enumerate(zip(want, got)):
            assert b is not None
            for cls, (ca, cb) in enumerate(zip(a, b)):
                assert ca.shape == cb.shape, (i, cls, ca.shape, cb.shape)
                np.testing.assert_allclose(
                    ca, cb, rtol=1e-4, atol=1e-4,
                    err_msg=f"branch {branch} frame {i} class {cls}")


def test_streaming_repair_fires_and_stays_exact():
    """Adversarial slide: one frame's fc1 rows are scaled to dominate every
    attention row; when that frame is evicted the anchor gap exceeds θ and
    the ENGINE's health-gated rebuild (the combined lax.cond inside
    stream_update) must fire — detections must still match the exact ring,
    and the post-slide state must satisfy the health invariant.

    Drives ring_push/ring_step directly with crafted feature dicts (the
    op-level repair test covers the accumulator math; this covers the
    head/engine wiring: M-table threading, the single combined cond, and
    decode-after-repair)."""
    import jax.numpy as jnp
    from hvrnet_tpu.ops.streaming_attention import THETA, degenerate_rows

    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=2, proposals=8)
    test_cfg["bbox_head"]["t_dim"] = 5
    test_cfg["bbox_head"]["key_dim"] = 2
    exact = HNMBRCNN(model_cfg, None, test_cfg)
    params = exact.init_params(jax.random.PRNGKey(0))
    stream = HNMBRCNN(model_cfg, None, test_cfg)
    stream.stream = True

    T, P, D = 5, 8, 1024
    rng = np.random.default_rng(3)

    def feats_for(i):
        fc1 = rng.normal(size=(P, D)).astype(np.float32)
        if i == 2:                     # the dominant frame
            fc1 = fc1 * 40.0
        return dict(fc1=jnp.asarray(fc1),
                    boxes=jnp.asarray(
                        rng.uniform(5, 60, size=(P, 4)).astype(np.float32)),
                    scores=jnp.zeros((P,), jnp.float32),
                    mask=jnp.asarray(rng.random(P) > 0.2))

    frames = [feats_for(i) for i in range(12)]
    ish = np.array([64.0, 96.0], np.float32)
    sf = np.ones((4,), np.float32)

    st_e = exact.ring_reset(D)
    st_s = stream.ring_reset(D)
    must_fire_seen = False
    for i, f in enumerate(frames):
        if i < T:
            st_e = exact.ring_push(st_e, f)
            st_s = stream.ring_push(st_s, f, params=params)
            continue
        # the slide about to run evicts slot i % T; if some row's anchor
        # sits > θ above the max over the SURVIVING slots' logit maxima,
        # only the engine's rebuild cond can leave a healthy state
        slot = i % T
        for name in ("1", "3"):
            M_pre = np.asarray(st_s["M" + name])
            m_pre = np.asarray(st_s["m" + name])
            others = np.delete(M_pre, slot, axis=1).max(axis=1)
            if np.any(m_pre - others > THETA):
                must_fire_seen = True
        st_e, out_e = exact.ring_step(params, st_e, f, ish, sf, branch=-1)
        st_s, out_s = stream.ring_step(params, st_s, f, ish, sf, branch=-1)
        # health invariant: after every engine slide the state is repaired
        for name in ("1", "3"):
            acc = dict(m=st_s["m" + name], l=st_s["l" + name],
                       a=st_s["a" + name])
            bad = degenerate_rows(acc, st_s["M" + name])
            assert not bool(bad.any()), (i, name)
        de, le, ve = out_e
        ds, ls, vs = out_s
        np.testing.assert_allclose(np.asarray(de), np.asarray(ds),
                                   rtol=1e-3, atol=1e-3, err_msg=str(i))
        np.testing.assert_array_equal(np.asarray(le), np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(ve), np.asarray(vs))
    # the 40× frame's eviction must actually have required a rebuild —
    # otherwise this test degenerates to the ordinary equality check
    assert must_fire_seen, "adversarial frame never forced a repair"


def test_rollback_healthy_equals_cond_path():
    """Speculative-rollback stream step (no in-program repair cond) must
    bit-match the cond path on healthy inputs — same slide math, the cond
    simply never fires — and the health flag must stay False."""
    import jax.numpy as jnp

    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=2, proposals=8)
    test_cfg["bbox_head"]["t_dim"] = 5
    test_cfg["bbox_head"]["key_dim"] = 2
    cond = HNMBRCNN(model_cfg, None, test_cfg)
    cond.stream = True
    params = cond.init_params(jax.random.PRNGKey(0))
    spec = HNMBRCNN(model_cfg, None, test_cfg)
    spec.stream = True
    spec.stream_rollback = True

    T, P, D = 5, 8, 1024
    rng = np.random.default_rng(7)
    ish = np.array([64.0, 96.0], np.float32)
    sf = np.ones((4,), np.float32)
    st_c = cond.ring_reset(D)
    st_s = spec.ring_reset(D)
    assert "flag" in st_s and "flag" not in st_c
    for i in range(11):
        f = dict(fc1=jnp.asarray(rng.normal(size=(P, D)).astype(np.float32)),
                 boxes=jnp.asarray(
                     rng.uniform(5, 60, size=(P, 4)).astype(np.float32)),
                 mask=jnp.asarray(rng.random(P) > 0.2))
        if i < T:
            st_c = cond.ring_push(st_c, f, params=params)
            st_s = spec.ring_push(st_s, f, params=params)
            continue
        st_c, out_c = cond.ring_step(params, st_c, f, ish, sf, branch=-1)
        st_s, out_s = spec.ring_step(params, st_s, f, ish, sf, branch=-1)
        assert not bool(st_s["flag"]), i
        de, le, ve = out_c
        ds, ls, vs = out_s
        # same slide math; the two programs fuse differently so allow
        # reduction-order noise
        np.testing.assert_allclose(np.asarray(de), np.asarray(ds),
                                   rtol=1e-4, atol=1e-4, err_msg=str(i))
        np.testing.assert_array_equal(np.asarray(le), np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(ve), np.asarray(vs))


def test_rollback_flags_adversarial_and_rebuild_recovers():
    """An adversarial dominant-frame eviction that degenerates the streaming
    accumulators must SET the health flag under rollback (no in-program
    repair); `stream_rebuild` must then restore the health invariant + clear
    the flag, after which the stream matches the exact ring again.  (120×:
    at 40× the post-slide anchor gap measures 9.3 nats — just under θ=10,
    genuinely healthy — because the replacement frame's keys raise the rows'
    live maxima; the cond-path test's pre-slide prediction overestimates.)"""
    import jax.numpy as jnp
    from hvrnet_tpu.ops.streaming_attention import degenerate_rows

    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=2, proposals=8)
    test_cfg["bbox_head"]["t_dim"] = 5
    test_cfg["bbox_head"]["key_dim"] = 2
    exact = HNMBRCNN(model_cfg, None, test_cfg)
    params = exact.init_params(jax.random.PRNGKey(0))
    spec = HNMBRCNN(model_cfg, None, test_cfg)
    spec.stream = True
    spec.stream_rollback = True

    T, P, D = 5, 8, 1024
    rng = np.random.default_rng(3)

    def feats_for(i):
        fc1 = rng.normal(size=(P, D)).astype(np.float32)
        if i == 2:                     # the dominant frame
            fc1 = fc1 * 120.0
        return dict(fc1=jnp.asarray(fc1),
                    boxes=jnp.asarray(
                        rng.uniform(5, 60, size=(P, 4)).astype(np.float32)),
                    mask=jnp.asarray(rng.random(P) > 0.2))

    frames = [feats_for(i) for i in range(12)]
    ish = np.array([64.0, 96.0], np.float32)
    sf = np.ones((4,), np.float32)

    st_e = exact.ring_reset(D)
    st_s = spec.ring_reset(D)
    flagged_at = None
    persistent_fire_predicted = False
    compared_after_rebuild = False
    for i, f in enumerate(frames):
        if i < T:
            st_e = exact.ring_push(st_e, f)
            st_s = spec.ring_push(st_s, f, params=params)
            continue
        st_e, out_e = exact.ring_step(params, st_e, f, ish, sf, branch=-1)
        st_s, out_s = spec.ring_step(params, st_s, f, ish, sf, branch=-1)
        # ground truth: is the persistent post-slide state degenerate?
        truly_bad = any(bool(np.asarray(degenerate_rows(
            dict(m=st_s["m" + n], l=st_s["l" + n], a=st_s["a" + n]),
            st_s["M" + n])).any()) for n in ("1", "3"))
        if truly_bad:
            persistent_fire_predicted = True
            assert bool(st_s["flag"]), \
                f"persistent degeneracy at step {i} but flag unset"
        if bool(st_s["flag"]):
            # runner protocol: this step's speculative output is discarded
            # (the runner replays it exactly); rebuild + clear the flag
            flagged_at = i if flagged_at is None else flagged_at
            st_s = spec.stream_rebuild(params, st_s)
            assert not bool(st_s["flag"])
            for n in ("1", "3"):
                acc = dict(m=st_s["m" + n], l=st_s["l" + n],
                           a=st_s["a" + n])
                assert not bool(degenerate_rows(acc, st_s["M" + n]).any()), n
            continue
        if flagged_at is not None:
            # post-rebuild healthy streaming must match the exact ring
            compared_after_rebuild = True
            de, le, ve = out_e
            ds, ls, vs = out_s
            np.testing.assert_allclose(np.asarray(de), np.asarray(ds),
                                       rtol=1e-3, atol=1e-3, err_msg=str(i))
            np.testing.assert_array_equal(np.asarray(le), np.asarray(ls))
            np.testing.assert_array_equal(np.asarray(ve), np.asarray(vs))
    assert flagged_at is not None, \
        "adversarial frame never set the health flag"
    assert persistent_fire_predicted, \
        "adversarial frame never forced a persistent repair"
    assert compared_after_rebuild, "no healthy post-rebuild step compared"


def test_runner_replay_protocol():
    """End-to-end rollback protocol through the runner: with the head's
    repair threshold forced to −1 every step flags, so EVERY flushed chunk
    must take the replay branch (exact window_detect per output +
    stream_rebuild per chunk) — results must equal the exact-ring runner's
    EXACTLY (replayed outputs are full-window recomputes, not streaming
    approximations)."""
    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=2, proposals=8)
    test_cfg["bbox_head"]["t_dim"] = 5
    test_cfg["bbox_head"]["key_dim"] = 2
    exact = HNMBRCNN(model_cfg, None, test_cfg)
    params = exact.init_params(jax.random.PRNGKey(0))

    model_cfg_rb = dict(model_cfg)
    model_cfg_rb["bbox_head"] = dict(model_cfg["bbox_head"],
                                     stream_theta=-1.0)
    stream = HNMBRCNN(model_cfg_rb, None, test_cfg)
    stream.stream = True

    rebuilds = []
    orig = stream.stream_rebuild
    stream.stream_rebuild = lambda p, s: (rebuilds.append(1), orig(p, s))[1]

    n = 13
    want = run(exact, params, n)
    runner = SlidingWindowRunner(stream, params, branch=-1, flush_every=4)
    assert runner.speculative
    # the rollback flag is scoped to run(): untouched before, restored after
    assert "stream_rollback" not in stream.__dict__
    got = runner.run(synthetic_stream(n), num_frames=n)
    assert rebuilds, "replay branch never ran despite theta=-1"
    assert len(want) == len(got) == n
    for i, (a, b) in enumerate(zip(want, got)):
        for cls, (ca, cb) in enumerate(zip(a, b)):
            np.testing.assert_allclose(ca, cb, rtol=1e-5, atol=1e-5,
                                       err_msg=f"frame {i} class {cls}")


def test_streaming_reset_requires_full_key_coverage():
    """A head whose key prefix doesn't cover the ring must refuse to stream
    (the accumulators assume every cached row is a key)."""
    import pytest
    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=2, proposals=8)
    test_cfg["bbox_head"]["t_dim"] = 3          # keys cover 3 of 5 frames
    test_cfg["bbox_head"]["key_dim"] = 2
    eng = HNMBRCNN(model_cfg, None, test_cfg)
    eng.stream = True
    with pytest.raises(ValueError, match="streaming ring"):
        eng.ring_reset(16)
