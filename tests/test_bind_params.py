"""Closure-bound params (engine.bind_params) ≡ arg-passing programs.

bind_params embeds the checkpoint's parameters as XLA constants in the
steady-state per-frame programs (backbone, post, ring/stream step/detect) to
drop the 568-leaf param-tree dispatch argument — BASELINE.md round 3.  The
math is identical; these tests pin that, the identity-check fallback, and
cache invalidation on rebind.
"""
import numpy as np
import jax
import pytest

from hvrnet_tpu.engine import HNMBRCNN, SelsaRCNN, SlidingWindowRunner

from tests.test_engine_selsa import synthetic_stream, tiny_selsa_cfg
from tests.test_engine_hnmb import tiny_hnmb_cfg


def _run(engine, params, n=5, bind=False):
    runner = SlidingWindowRunner(engine, params, bind=bind)
    return runner.run(synthetic_stream(n), num_frames=n)


def _assert_same(res_a, res_b):
    for ra, rb in zip(res_a, res_b):
        for ca, cb in zip(ra, rb):
            np.testing.assert_array_equal(ca, cb)


def test_selsa_bound_equals_unbound():
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    ref = _run(engine, params, bind=False)
    assert engine._bound_params is None       # CPU default: no bind
    out = _run(engine, params, bind=True)
    assert engine._bound_params is params
    assert engine._bound_fns                  # bound programs were used
    _assert_same(ref, out)


def test_hnmb_stream_bound_equals_unbound():
    model_cfg, test_cfg = tiny_hnmb_cfg()
    engine = HNMBRCNN(model_cfg, None, test_cfg)
    engine.stream = True
    params = engine.init_params(jax.random.PRNGKey(1))
    ref = _run(engine, params, bind=False)
    out = _run(engine, params, bind=True)
    keys = {k[0] for k in engine._bound_fns}
    # default binding is head-only: backbone keeps its param argument
    assert "stream_step" in keys and "backbone" not in keys
    _assert_same(ref, out)
    # full binding (backbone=True) embeds the conv weights too — still exact
    engine.bind_params(params, backbone=True)
    out_full = _run(engine, params, bind=False)   # stays bound (identity)
    keys = {k[0] for k in engine._bound_fns}
    assert "backbone" in keys
    _assert_same(ref, out_full)


def test_bound_fallback_on_other_params():
    """A caller holding a DIFFERENT params object must hit the regular
    arg-passing programs (identity check), and rebinding must drop the
    stale bound programs."""
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    p0 = engine.init_params(jax.random.PRNGKey(0))
    p1 = engine.init_params(jax.random.PRNGKey(7))
    engine.bind_params(p0)
    # run with p1: must NOT reuse p0-bound constants
    ref_engine = SelsaRCNN(model_cfg, None, test_cfg)
    ref = _run(ref_engine, p1, bind=False)
    out = _run(engine, p1, bind=False)
    _assert_same(ref, out)
    # rebinding the same object keeps the compiled programs
    engine.bind_params(p0)
    fns = engine._bound_fns
    engine.bind_params(p0)
    assert engine._bound_fns is fns
    # rebinding a new object drops them
    engine.bind_params(p1)
    assert engine._bound_fns is not fns and not engine._bound_fns
