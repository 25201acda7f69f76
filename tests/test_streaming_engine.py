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
