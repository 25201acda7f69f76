"""Cross-framework parity: a torch implementation of the reference's
caffe-style ResNet bottleneck stack (matching mmdet's layer/naming scheme) is
randomly initialized, exported as a reference-style state_dict, converted
with `convert_torch_checkpoint`, and the flax backbone + shared head must
reproduce its activations.  This validates architecture wiring (stride
placement, BN folding, downsample paths) and the converter end to end."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hvrnet_tpu.models import build_model_module  # noqa: E402
from hvrnet_tpu.utils.checkpoint import (convert_torch_checkpoint,  # noqa: E402
                                         merge_params)


class TorchBottleneck(tnn.Module):
    """caffe style: stride on conv1 (reference resnet.py:127-132)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBackbone(tnn.Module):
    """R50 stages 1-3 + stem, reference naming (conv1/bn1/layerN.M.convK)."""

    BLOCKS = (3, 4, 6)
    STRIDES = (1, 2, 2)

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for i, (n, s) in enumerate(zip(self.BLOCKS, self.STRIDES)):
            planes = 64 * 2 ** i
            blocks = [TorchBottleneck(inplanes, planes, s, downsample=True)]
            inplanes = planes * 4
            for _ in range(1, n):
                blocks.append(TorchBottleneck(inplanes, planes))
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(3):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


def randomize_bn(model, rng):
    """Give BN non-trivial running stats so folding is actually exercised."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.5, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                (rng.uniform(0.5, 2.0, n)).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                rng.normal(1, 0.2, n).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.normal(0, 0.2, n).astype(np.float32)))


def test_backbone_matches_torch_through_converter():
    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    tb = TorchBackbone().eval()
    randomize_bn(tb, rng)

    sd = {f"backbone.{k}": v.detach().numpy() for k, v in tb.state_dict().items()
          if "num_batches_tracked" not in k}
    loaded = convert_torch_checkpoint(sd)

    model_cfg = dict(
        type="SelsaRCNN",
        backbone=dict(type="ResNet", depth=50, num_stages=3, strides=(1, 2, 2),
                      dilations=(1, 1, 1), out_indices=(2,), frozen_stages=1,
                      style="caffe", norm_eval=True),
        shared_head=dict(type="ResLayer", depth=50, stage=3, stride=1,
                         dilation=2, style="caffe", norm_eval=True,
                         external_conv=True),
        rpn_head=dict(type="RPNHead", in_channels=1024, feat_channels=64,
                      anchor_scales=[4, 8, 16, 32],
                      anchor_ratios=[0.5, 1.0, 2.0], anchor_strides=[16]),
        bbox_head=dict(type="SelsaBBoxHead", sampler_num=4, t_dim=2,
                       in_channels=256, num_classes=31,
                       reg_class_agnostic=True))
    mod = build_model_module(model_cfg)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    merged, missing = merge_params(params["params"], loaded["params"])
    # all backbone tensors must be covered by the conversion
    assert not any(m.startswith("backbone") for m in missing), \
        [m for m in missing if m.startswith("backbone")][:5]
    params = {"params": merged}

    x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()          # (1, 1024, 4, 6)
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=mod.extract_feat)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
