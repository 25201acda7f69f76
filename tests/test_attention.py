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


def test_engine_kv_sharded_attention_matches_unsharded():
    """enable_kv_sharded_attention reruns the whole window head with K/V
    sharded over the 8-device CPU mesh — detections must match the
    single-device path (incl. the −∞ key-padding when nongt is not
    divisible by the axis size: 3×6=18 keys over 8 devices)."""
    from hvrnet_tpu.engine import HNMBRCNN, SelsaRCNN
    from hvrnet_tpu.parallel.mesh import make_mesh
    from tests.test_engine_hnmb import tiny_hnmb_cfg
    from tests.test_engine_selsa import tiny_selsa_cfg

    rng = np.random.default_rng(4)
    for cls, cfg_fn, P in ((SelsaRCNN, tiny_selsa_cfg, 6),
                           (HNMBRCNN, tiny_hnmb_cfg, 8)):
        model_cfg, test_cfg = cfg_fn(window_interval=1, proposals=P)
        engine = cls(model_cfg, None, test_cfg)
        params = engine.init_params(jax.random.PRNGKey(0))
        T = 3
        fc1 = jnp.asarray(rng.normal(size=(T, P, 1024)).astype(np.float32))
        boxes = jnp.asarray(
            np.concatenate([rng.random((T, P, 2)) * 40,
                            40 + rng.random((T, P, 2)) * 40],
                           axis=-1).astype(np.float32))
        masks = jnp.asarray(rng.random((T, P)) < 0.9)
        ish = np.array([86.0, 118.0], np.float32)
        sf = np.ones((4,), np.float32)

        base = engine.window_detect(params, fc1, boxes, masks, ish, sf,
                                    branch=-1 if cls is HNMBRCNN else None)
        engine.enable_kv_sharded_attention(make_mesh(8))
        shard = engine.window_detect(params, fc1, boxes, masks, ish, sf,
                                     branch=-1 if cls is HNMBRCNN else None)
        for a, b in zip(base, shard):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-4, atol=1e-4)
        # restore the unsharded module for other tests sharing lru caches
        engine.model_cfg["bbox_head"].pop("attention_mesh", None)


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
