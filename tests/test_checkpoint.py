"""torch→jax weight conversion round-trip: build the torch-side layout
synthetically, convert, and check the jax model consumes it and that a conv
output matches a direct computation."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.utils.checkpoint import (convert_torch_checkpoint,
                                         merge_params, save_checkpoint,
                                         load_checkpoint)


def torch_style_state_dict(rng):
    """Minimal fake reference state_dict covering each mapping family."""
    sd = {}
    sd["backbone.conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    for k, shape in [("weight", (64,)), ("bias", (64,)),
                     ("running_mean", (64,)), ("running_var", (64,))]:
        sd[f"backbone.bn1.{k}"] = rng.normal(size=shape).astype(np.float32) ** 2
    # one bottleneck of layer1 with downsample
    sd["backbone.layer1.0.conv1.weight"] = rng.normal(size=(64, 64, 1, 1)).astype(np.float32)
    for k in ["weight", "bias", "running_mean", "running_var"]:
        sd[f"backbone.layer1.0.bn1.{k}"] = rng.normal(size=(64,)).astype(np.float32) ** 2
    sd["backbone.layer1.0.downsample.0.weight"] = rng.normal(size=(256, 64, 1, 1)).astype(np.float32)
    for k in ["weight", "bias", "running_mean", "running_var"]:
        sd[f"backbone.layer1.0.downsample.1.{k}"] = rng.normal(size=(256,)).astype(np.float32) ** 2
    sd["shared_head.new_layer_1.conv.weight"] = rng.normal(size=(256, 2048, 1, 1)).astype(np.float32)
    sd["shared_head.new_layer_1.conv.bias"] = rng.normal(size=(256,)).astype(np.float32)
    sd["rpn_head.rpn_conv.weight"] = rng.normal(size=(512, 1024, 3, 3)).astype(np.float32)
    sd["rpn_head.rpn_conv.bias"] = rng.normal(size=(512,)).astype(np.float32)
    sd["bbox_head.fc_new_1.weight"] = rng.normal(size=(1024, 12544)).astype(np.float32)
    sd["bbox_head.fc_new_1.bias"] = rng.normal(size=(1024,)).astype(np.float32)
    sd["bbox_head.selsa_1.q_data_fc_1.weight"] = rng.normal(size=(1024, 1024)).astype(np.float32)
    sd["bbox_head.selsa_1.q_data_fc_1.bias"] = rng.normal(size=(1024,)).astype(np.float32)
    sd["bbox_head.selsa_1.linear_out_1.weight"] = rng.normal(size=(1024, 1024, 1, 1)).astype(np.float32)
    sd["bbox_head.selsa_1.linear_out_1.bias"] = rng.normal(size=(1024,)).astype(np.float32)
    sd["bbox_head.fc_cls.weight"] = rng.normal(size=(31, 1024)).astype(np.float32)
    sd["bbox_head.fc_cls.bias"] = rng.normal(size=(31,)).astype(np.float32)
    return sd


def test_convert_layout_and_values():
    rng = np.random.default_rng(0)
    sd = torch_style_state_dict(rng)
    tree = convert_torch_checkpoint(sd)["params"]

    # conv OIHW → HWIO
    w = tree["backbone"]["stem"]["conv"]["kernel"]
    assert w.shape == (7, 7, 3, 64)
    np.testing.assert_array_equal(w[0, 0, 0], sd["backbone.conv1.weight"][:, 0, 0, 0])
    # bn stats mapping
    np.testing.assert_array_equal(tree["backbone"]["stem"]["bn"]["mean"],
                                  sd["backbone.bn1.running_mean"])
    # downsample split conv/bn
    assert tree["backbone"]["layer1"]["block0"]["downsample"]["conv"]["kernel"].shape == (1, 1, 64, 256)
    # fc transpose
    assert tree["bbox_head"]["fc_new_1"]["kernel"].shape == (12544, 1024)
    # selsa suffix stripping + 1×1 conv → dense
    assert tree["bbox_head"]["selsa_1"]["q_data_fc"]["kernel"].shape == (1024, 1024)
    np.testing.assert_array_equal(
        tree["bbox_head"]["selsa_1"]["linear_out"]["kernel"],
        sd["bbox_head.selsa_1.linear_out_1.weight"][:, :, 0, 0].T)

    # equivalence: torch conv (NCHW, OIHW) vs our NHWC HWIO on a random input
    import torch
    import torch.nn.functional as tF
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ref = tF.conv2d(torch.from_numpy(x),
                    torch.from_numpy(sd["backbone.conv1.weight"]),
                    stride=2, padding=3).numpy()
    import jax.numpy as jnp
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w),
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_merge_params_shape_check():
    init = {"a": {"w": np.zeros((2, 3), np.float32)},
            "b": {"w": np.zeros((4,), np.float32)}}
    loaded = {"a": {"w": np.ones((2, 3), np.float32)}}
    merged, missing = merge_params(init, loaded)
    np.testing.assert_array_equal(merged["a"]["w"], 1.0)
    assert missing == ["b/w"]


def test_orbax_roundtrip(tmp_path):
    params = {"layer": {"w": jnp.arange(6.0).reshape(2, 3)}}
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params, meta={"epoch": 3})
    restored, meta = load_checkpoint(p, params)
    np.testing.assert_array_equal(np.asarray(restored["layer"]["w"]),
                                  np.asarray(params["layer"]["w"]))
    assert meta["epoch"] == 3
