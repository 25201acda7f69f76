"""Fused masked attention: parity with the XLA expression + gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.ops.attention import (_attention_reference, _flash_attention,
                                      masked_attention, NEG_INF)


def inputs(rng, nq=70, nk=130, d=128):
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(nk, d)).astype(np.float32))
    mask = rng.random(nk) > 0.2
    bias = jnp.where(jnp.asarray(mask), 0.0, NEG_INF)
    return q, k, v, bias


def test_masked_attention_matches_reference():
    rng = np.random.default_rng(0)
    q, k, v, bias = inputs(rng)
    scale = 1.0 / np.sqrt(128)
    got = masked_attention(q, k, v, bias, scale)
    ref = _attention_reference(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_flash_kernel_interpret_mode_matches():
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from functools import partial
    import hvrnet_tpu.ops.attention as A
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)
    rng = np.random.default_rng(1)
    q, k, v, bias = inputs(rng, nq=40, nk=80, d=128)
    scale = 1.0 / np.sqrt(128)
    pl.pallas_call = interp_call
    try:
        got = A._flash_attention(q, k, v, bias, scale, tq=32, tk=64)
    finally:
        pl.pallas_call = orig
    ref = _attention_reference(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kv_sharded_attention_matches_single_device():
    """Sequence-parallel K/V sharding over the 8-device CPU mesh must equal
    the single-device softmax exactly, at the 63-frame-window scale
    (~18.9k keys) with padded-slot masking."""
    from hvrnet_tpu.ops.attention import masked_attention_kv_sharded
    from hvrnet_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    D, NQ, NK = 128, 304, 18944          # 63×300 rounded to /8
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(NK, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(NK, D)).astype(np.float32))
    bias = jnp.where(jnp.asarray(rng.random(NK) < 0.1), -1e30, 0.0)

    want = _attention_reference(q, k, v, bias, scale=0.088)
    mesh = make_mesh(8)
    got = masked_attention_kv_sharded(q, k, v, bias, 0.088, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_masked_attention_gradients():
    rng = np.random.default_rng(2)
    q, k, v, bias = inputs(rng, nq=16, nk=24, d=128)
    scale = 1.0 / np.sqrt(128)

    def f(q, k, v):
        return masked_attention(q, k, v, bias, scale).sum()

    def f_ref(q, k, v):
        return _attention_reference(q, k, v, bias, scale).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
