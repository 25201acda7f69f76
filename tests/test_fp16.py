"""FP16 loss-scaling subsystem: config-driven wiring through BaseTrainer
(VERDICT r2 missing #3 / weak #3).

Counterpart of `/root/reference/mmdet/core/fp16/hooks.py:11-85`
(Fp16OptimizerHook: backprop ``loss * loss_scale``, unscale grads, step) —
plus the skip-on-overflow safety net: non-finite grads leave params AND
optimizer state untouched.  A numeric ``fp16 = dict(loss_scale=N)`` stays
fixed (the reference's semantics); ``loss_scale='dynamic'`` adds mmcv-style
growth/backoff (DynamicLossScale).
"""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.core.precision import DynamicLossScale, LossScaleState
from hvrnet_tpu.engine import SelsaRCNN
from hvrnet_tpu.engine.train import SelsaTrainer
from tests.test_train_step import make_sample, tiny_model_cfg, tiny_train_cfg


def _flat(tree):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(tree)])


def _setup(fp16=None, mesh=None):
    model_cfg = tiny_model_cfg(sampler_num=8, t_dim=3)
    eng = SelsaRCNN(model_cfg, tiny_train_cfg(two_stage_sampler=False), None)
    params = eng.init_params(jax.random.PRNGKey(0))
    cfg = dict(optimizer=dict(lr=1e-3, momentum=0.9, weight_decay=1e-4))
    if fp16 is not None:
        cfg["fp16"] = fp16
    trainer = SelsaTrainer(eng, cfg, mesh=mesh, steps_per_epoch=10)
    state = trainer.create_state(params)
    return trainer, state


def test_fp16_static_scale_matches_unscaled_step():
    """loss·512 backprop + grad/512 must reproduce the unscaled update
    (hooks.py:63-77: scaled_loss.backward → grad.div_(loss_scale))."""
    rng = np.random.default_rng(0)
    batch = make_sample(rng, frames=3)
    key = jax.random.PRNGKey(1)

    trainer0, state0 = _setup(fp16=None)
    step0 = trainer0.make_train_step(64, 96)
    s0, logs0 = step0(state0, batch, key)

    trainer1, state1 = _setup(fp16=dict(loss_scale=512.0))
    assert state1.scale is not None
    step1 = trainer1.make_train_step(64, 96)
    s1, logs1 = step1(state1, batch, key)

    assert float(logs1["overflow"]) == 0.0
    assert float(logs1["loss_scale"]) == 512.0
    np.testing.assert_allclose(float(logs1["loss"]), float(logs0["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(_flat(s1.params), _flat(s0.params),
                               rtol=1e-4, atol=1e-6)
    # numeric scale is FIXED: good steps don't grow it
    assert float(s1.scale.scale) == 512.0


def test_fp16_overflow_skips_params_and_opt_state():
    trainer, state = _setup(fp16=dict(loss_scale=512.0))
    # warm momentum so a skipped step has a non-trivial opt_state to preserve
    step = trainer.make_train_step(64, 96)
    rng = np.random.default_rng(1)
    batch = make_sample(rng, frames=3)
    state, _ = step(state, batch, jax.random.PRNGKey(2))

    p_before = _flat(state.params)
    o_before = _flat(state.opt_state)
    step_before = int(state.step)   # host copies: the step donates state
    # force an overflow: an inf scale makes every grad non-finite
    poisoned = state._replace(scale=LossScaleState(
        jnp.float32(jnp.inf), state.scale.good_steps))
    nxt, logs = step(poisoned, batch, jax.random.PRNGKey(3))

    assert float(logs["overflow"]) == 1.0
    np.testing.assert_array_equal(_flat(nxt.params), p_before)
    np.testing.assert_array_equal(_flat(nxt.opt_state), o_before)
    assert int(nxt.step) == step_before + 1   # the step still advances


def test_dynamic_loss_scale_growth_and_backoff():
    """mmcv-style dynamics: growth_interval good steps double the scale,
    one overflow halves it and resets the streak."""
    ls = DynamicLossScale(init_scale=64.0, growth_interval=2)
    st = ls.init()
    good = {"g": jnp.ones((3,), jnp.float32) * 64.0}
    bad = {"g": jnp.array([1.0, jnp.inf, 1.0], jnp.float32)}

    g, finite, st = ls.unscale_and_check(good, st)
    assert bool(finite) and float(st.scale) == 64.0
    np.testing.assert_allclose(np.asarray(g["g"]), 1.0)
    _, finite, st = ls.unscale_and_check(good, st)
    assert bool(finite) and float(st.scale) == 128.0     # grew after 2 good
    assert int(st.good_steps) == 0
    _, finite, st = ls.unscale_and_check(bad, st)
    assert not bool(finite) and float(st.scale) == 64.0  # backoff
    assert int(st.good_steps) == 0


def test_fp16_mesh_step_runs():
    """The shard_map path threads the scale state as a replicated arg."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("data",))
    trainer, state = _setup(fp16=dict(loss_scale=128.0), mesh=mesh)
    step = trainer.make_train_step(64, 96)
    rng = np.random.default_rng(3)
    one = make_sample(rng, frames=3)
    batch = jax.tree_util.tree_map(
        lambda x: np.concatenate([x, x], axis=0), one)
    rngs = jax.random.split(jax.random.PRNGKey(5), 2)
    nxt, logs = step(state, batch, rngs)
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["overflow"]) == 0.0
    assert float(nxt.scale.scale) == 128.0
