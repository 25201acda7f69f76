"""Deformable ops + backbone plugins: zero-offset equivalence and shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.ops.deform import (deform_conv2d, deform_roi_pooling,
                                   masked_conv2d)
from hvrnet_tpu.ops import roi_align
from hvrnet_tpu.models.plugins import (ContextBlock, GeneralizedAttention,
                                       NonLocal2D)


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 8)).astype(np.float32))
    offset = jnp.zeros((2, 12, 14, 18))
    got = deform_conv2d(x, offset, w, kernel_size=3, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_offset_shifts_sampling():
    # integer offset (0, +1) shifts sampling one pixel right for every tap
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)).astype(np.float32))
    off = jnp.zeros((1, 8, 8, 18)).at[..., 1::2].set(1.0)  # dx=+1
    got = deform_conv2d(x, off, w, kernel_size=3, padding=1)
    x_sh = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    ref = jax.lax.conv_general_dilated(
        x_sh, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # interior matches (border rows differ via zero-padding rules)
    np.testing.assert_allclose(np.asarray(got)[:, 1:-1, 1:-2],
                               np.asarray(ref)[:, 1:-1, 1:-2],
                               rtol=1e-4, atol=1e-4)


def test_modulated_mask_scales_output():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    off = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    full = deform_conv2d(x, off, w)
    gated = deform_conv2d(x, off, w, mask=half)
    np.testing.assert_allclose(np.asarray(gated), 0.5 * np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_deform_roi_pooling_zero_offset_close_to_roi_align():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(1, 16, 20, 4)).astype(np.float32))
    rois = jnp.asarray([[0, 32.0, 16.0, 200.0, 150.0]])
    a = roi_align(feats, rois, out_size=7, spatial_scale=1 / 16.0, sample_num=2)
    b = deform_roi_pooling(feats, rois, None, out_size=7,
                           spatial_scale=1 / 16.0, sample_num=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-3)


def test_masked_conv():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    mask = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    out = masked_conv2d(x, mask, w)
    assert np.abs(np.asarray(out)[:, 4:]).max() == 0
    assert np.abs(np.asarray(out)[:, :4]).max() > 0


def test_plugins_shapes():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 16)).astype(np.float32))
    for mod in (NonLocal2D(16), ContextBlock(16, ratio=0.25),
                GeneralizedAttention(16, num_heads=4)):
        params = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(params, x)
        assert y.shape == x.shape
        # zero-init output projections ⇒ identity at init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
