"""StemBlock (fused space-to-depth stem) vs the plain conv+BN+relu+pool.

The s2d pipeline (models/layers.py:StemBlock) must be numerically the plain
7×7/2 conv + frozen BN + relu + 3×3/2 maxpool it replaces — the stored
kernel is only rearranged.  The torch-parity test covers the fast path
against torch through the converter; this covers fast-vs-plain directly and
the odd-size fallback branch.
"""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.models.layers import ConvBN, StemBlock, max_pool_3x3_s2_p1

jax.config.update("jax_platforms", "cpu")


def _params(rng):
    k = rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1
    bn = dict(scale=jnp.asarray(rng.normal(size=64).astype(np.float32)),
              bias=jnp.asarray(rng.normal(size=64).astype(np.float32)),
              mean=jnp.asarray(rng.normal(size=64).astype(np.float32)),
              var=jnp.abs(jnp.asarray(
                  rng.normal(size=64).astype(np.float32))) + 1.0)
    return {"params": {"conv": {"kernel": jnp.asarray(k)}, "bn": bn}}


def _plain(p, x):
    out = ConvBN(64, (7, 7), (2, 2), padding=3).apply(p, x)
    return max_pool_3x3_s2_p1(out)


def test_stem_block_fast_path_matches_plain():
    rng = np.random.default_rng(0)
    p = _params(rng)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    got = StemBlock().apply(p, x)
    want = _plain(p, x)
    assert got.shape == want.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stem_block_fallback_matches_plain():
    rng = np.random.default_rng(1)
    p = _params(rng)
    x = jnp.asarray(rng.normal(size=(1, 62, 94, 3)).astype(np.float32))
    got = StemBlock().apply(p, x)
    want = _plain(p, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)   # same lowering → bit-equal


def test_stem_block_param_tree_matches_convbn():
    """Converter parity: the s2d stem declares the SAME param paths/shapes
    as the ConvBN stem it replaced (stem/conv/kernel + stem/bn/*)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    a = StemBlock().init(jax.random.PRNGKey(0), x)
    b = ConvBN(64, (7, 7), (2, 2), padding=3).init(jax.random.PRNGKey(0), x)
    sa = jax.tree.structure(a)
    sb = jax.tree.structure(b)
    assert sa == sb, (sa, sb)
    shapes = jax.tree.map(lambda t: t.shape, a)
    shapes_b = jax.tree.map(lambda t: t.shape, b)
    assert shapes == shapes_b
