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


def test_deform_conv_groups_replicated_offsets_match_single_group():
    """G identical offset fields ≡ one shared field (the grouped path of
    `deform_conv_cuda_kernel.cu`: each C/G channel slice samples with its
    own offsets; replicating collapses to the ungrouped op)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 10, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 5)).astype(np.float32))
    off1 = jnp.asarray(rng.normal(size=(1, 10, 12, 18)).astype(np.float32))
    single = deform_conv2d(x, off1, w, kernel_size=3, padding=1)
    off4 = jnp.tile(off1, (1, 1, 1, 4))
    grouped = deform_conv2d(x, off4, w, kernel_size=3, padding=1,
                            deformable_groups=4)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(single),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_group_offsets_act_on_own_channel_slice():
    """A kernel that only reads group g's channels must ignore every other
    group's offsets (and follow g's)."""
    rng = np.random.default_rng(4)
    G, cg = 2, 3
    x = jnp.asarray(rng.normal(size=(1, 9, 9, G * cg)).astype(np.float32))
    w = np.zeros((3, 3, G * cg, 4), np.float32)
    w[:, :, cg:] = rng.normal(size=(3, 3, cg, 4))   # reads group 1 only
    w = jnp.asarray(w)
    off = jnp.asarray(rng.normal(size=(1, 9, 9, G * 18)).astype(np.float32))
    base = deform_conv2d(x, off, w, kernel_size=3, padding=1,
                         deformable_groups=G)
    # perturbing group 0's offsets changes nothing
    off_p0 = off.at[..., :18].add(1.7)
    same = deform_conv2d(x, off_p0, w, kernel_size=3, padding=1,
                         deformable_groups=G)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base))
    # perturbing group 1's offsets changes the output
    off_p1 = off.at[..., 18:].add(1.7)
    diff = deform_conv2d(x, off_p1, w, kernel_size=3, padding=1,
                         deformable_groups=G)
    assert np.abs(np.asarray(diff) - np.asarray(base)).max() > 1e-3


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
        # zero/gamma-init output projections ⇒ identity at init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_backbone_with_plugins():
    """Bottleneck plugin wiring (reference resnet.py:86-267): DCN replaces
    conv2, gen_attention after conv2, GCB after conv3, per-stage flags;
    with zero-init offsets + gamma=0 the plugin-enabled backbone equals the
    plain one at init, and with_cp (remat) is output-invariant."""
    from hvrnet_tpu.models.backbones.resnet import ResNet
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
    common = dict(depth=50, num_stages=2, strides=(1, 2), dilations=(1, 1),
                  out_indices=(1,), frozen_stages=-1, style="caffe")
    plain = ResNet(**common)
    p_plain = plain.init(jax.random.PRNGKey(0), x)

    plugged = ResNet(**common,
                     dcn=dict(modulated=False, deformable_groups=1,
                              fallback_on_stride=False),
                     stage_with_dcn=(False, True),
                     gcb=dict(ratio=0.25),
                     stage_with_gcb=(False, True),
                     gen_attention=dict(spatial_range=-1, num_heads=4,
                                        attention_type="1111", kv_stride=2),
                     stage_with_gen_attention=((), (0, 2)))
    p_plug = plugged.init(jax.random.PRNGKey(0), x)
    flat = [("/".join(str(k.key) for k in path))
            for path, _ in jax.tree_util.tree_flatten_with_path(p_plug)[0]]
    assert any("conv2_offset" in n for n in flat)
    assert any("gen_attention_block" in n for n in flat)
    assert any("context_block" in n for n in flat)

    y_plug = plugged.apply(p_plug, x)[0]
    assert y_plug.shape == plain.apply(p_plain, x)[0].shape

    # remat path is numerically identical
    remat = ResNet(**common, with_cp=True)
    p_remat = remat.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(remat.apply(p_remat, x)[0]),
                               np.asarray(plain.apply(p_plain, x)[0]),
                               rtol=1e-5, atol=1e-5)


def test_conv_ws_matches_torch_semantics():
    """ConvWS standardizes the kernel per output channel (Bessel std + eps)
    before convolving — verified against a direct numpy transcription of the
    torch reference (conv_ws.py:conv_ws_2d)."""
    from hvrnet_tpu.models.layers import ConvWS
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 6, 7, 3)).astype(np.float32)
    mod = ConvWS(features=4, kernel_size=(3, 3), padding=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    k = np.asarray(params["params"]["kernel"], np.float64)      # HWIO
    b = np.asarray(params["params"]["bias"], np.float64)
    flat = k.reshape(-1, k.shape[-1])                           # (khkwCin, O)
    kn = (k - flat.mean(0)) / (flat.std(0, ddof=1) + 1e-5)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.float64), jnp.asarray(kn),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_get_classes_registry():
    from hvrnet_tpu.core.evaluation import get_classes
    assert len(get_classes("voc")) == 20
    assert len(get_classes("coco")) == 80
    assert len(get_classes("vid")) == 30
    assert len(get_classes("det")) == 200
    assert get_classes("wider_face") == ["face"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        get_classes("nope")
