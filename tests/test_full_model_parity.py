"""End-to-end SELSA test-path parity vs an independent oracle.

Composes the strongest available mAP-parity proxy (SURVEY §7.8): a torch
model with the reference's layer naming (backbone stages 1-3, dilated
layer4 shared head + external conv, RPN head) is randomly initialized and
exported as a reference-style state_dict; the head fcs are exported the same
way.  `convert_torch_checkpoint` maps everything onto the flax SelsaRCNN
engine, and the full jax test path

    frame_features (backbone → shared → RPN → static NMS → RoIAlign → fc1)
    → window_detect (SELSA attention → get_det_bboxes → multiclass NMS)

must reproduce an oracle pipeline built from torch activations + the numpy
oracles already validated per-op (greedy NMS, RoIAlign kernel math, the
SELSA head equations, reference delta2bbox/multiclass_nms semantics).
Reference path: selsa_rcnn.py:247-338 + bbox_head.py:132-169 +
rpn_head.py:55-104 + tools/test.py:215-235.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hvrnet_tpu.engine import SelsaRCNN  # noqa: E402
from hvrnet_tpu.ops.anchors import AnchorGenerator  # noqa: E402
from hvrnet_tpu.utils.checkpoint import (convert_torch_checkpoint,  # noqa: E402
                                         merge_params)
from tests.test_head_parity import np_linear, np_nl_block, relu, to_np  # noqa: E402
from tests.test_ops_nms import greedy_nms_np, multiclass_nms_np  # noqa: E402
from tests.test_ops_roi_align import roi_align_np  # noqa: E402
from tests.test_torch_parity import TorchBackbone, TorchBottleneck, randomize_bn  # noqa: E402

D = 64          # fc_feat_dim (equations are dimension-agnostic)
NCLS = 9
P = 8           # proposals/frame == sampler_num (no nongt truncation)
INTERVAL = 1
T = 2 * INTERVAL + 1
H, W = 64, 96
IMG_SHAPE = (60.0, 92.0)
SCALE = np.array([1.25, 1.25, 1.25, 1.25], np.float32)
RPN_CFG = dict(nms_pre=64, nms_post=P, max_num=P, nms_thr=0.7,
               min_bbox_size=0)
RCNN_CFG = dict(score_thr=0.01, nms=dict(type="nms", iou_thr=0.3),
                max_per_img=20, key_dim=INTERVAL)


class TorchSharedHead(tnn.Module):
    """ResLayer: dilated layer4 + ConvModule(2048→256) (res_layer.py:50-74)."""

    def __init__(self):
        super().__init__()
        blocks = [TorchBottleneck(1024, 512, stride=1, dilation=2,
                                  downsample=True)]
        for _ in range(2):
            blocks.append(TorchBottleneck(2048, 512, dilation=2))
        self.layer4 = tnn.Sequential(*blocks)
        from collections import OrderedDict
        self.new_layer_1 = tnn.Sequential(
            OrderedDict(conv=tnn.Conv2d(2048, 256, 1)))
        self.relu = tnn.ReLU()

    def forward(self, x):
        return self.relu(self.new_layer_1(self.layer4(x)))


class TorchRPNHead(tnn.Module):
    def __init__(self, in_ch=1024, feat_ch=64, num_anchors=12):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(in_ch, feat_ch, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(feat_ch, num_anchors, 1)
        self.rpn_reg = tnn.Conv2d(feat_ch, num_anchors * 4, 1)
        self.relu = tnn.ReLU()

    def forward(self, x):
        h = self.relu(self.rpn_conv(x))
        return self.rpn_cls(h), self.rpn_reg(h)


class TorchSelsaFcs(tnn.Module):
    """Parameter container only (reference selsa_bbox_head.py:41-106 naming);
    the oracle head math runs in numpy on the converted weights."""

    def __init__(self):
        super().__init__()
        self.fc_new_1 = tnn.Linear(256 * 49, D)
        self.fc_new_2 = tnn.Linear(D, D)
        for i in (1, 2):
            blk = tnn.Module()
            blk.add_module(f"q_data_fc_{i}", tnn.Linear(D, D))
            blk.add_module(f"k_data_fc_{i}", tnn.Linear(D, D))
            blk.add_module(f"linear_out_{i}", tnn.Conv2d(D, D, 1))
            self.add_module(f"selsa_{i}", blk)
        self.fc_cls = tnn.Linear(D, NCLS)
        self.fc_reg = tnn.Linear(D, 4)


def np_delta2bbox(rois, deltas, means, stds, max_shape):
    """Reference transforms.py:delta2bbox (numpy oracle, +1 conventions)."""
    means = np.asarray(means, np.float64)
    stds = np.asarray(stds, np.float64)
    d = deltas.astype(np.float64) * stds + means
    max_ratio = np.abs(np.log(16.0 / 1000.0))
    dw = np.clip(d[:, 2], -max_ratio, max_ratio)
    dh = np.clip(d[:, 3], -max_ratio, max_ratio)
    px = (rois[:, 0] + rois[:, 2]) * 0.5
    py = (rois[:, 1] + rois[:, 3]) * 0.5
    pw = rois[:, 2] - rois[:, 0] + 1.0
    ph = rois[:, 3] - rois[:, 1] + 1.0
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    gx = px + pw * d[:, 0]
    gy = py + ph * d[:, 1]
    x1 = np.clip(gx - (gw - 1) * 0.5, 0, max_shape[1] - 1)
    y1 = np.clip(gy - (gh - 1) * 0.5, 0, max_shape[0] - 1)
    x2 = np.clip(gx + (gw - 1) * 0.5, 0, max_shape[1] - 1)
    y2 = np.clip(gy + (gh - 1) * 0.5, 0, max_shape[0] - 1)
    return np.stack([x1, y1, x2, y2], axis=-1)


def _model_cfg():
    return dict(
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
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", out_size=7, sample_num=2),
            out_channels=1024, featmap_strides=[16],
            feat_from_shared_head=True),
        bbox_head=dict(type="SelsaBBoxHead", sampler_num=P, t_dim=T,
                       fc_feat_dim=D, dim=(D, D, D), in_channels=256,
                       num_classes=NCLS, reg_class_agnostic=True,
                       loss_bbox=dict(type="SmoothL1Loss", beta=1.0)))


def _test_cfg():
    return dict(rpn=RPN_CFG, rcnn=RCNN_CFG,
                bbox_head=dict(sampler_num=P, t_dim=T, key_dim=INTERVAL),
                relation_setup=dict(shuffle=False, video_shuffle=True,
                                    has_rpn=True, frame_interval=INTERVAL,
                                    frame_stride=1))


def test_full_selsa_test_path_matches_oracle():
    rng = np.random.default_rng(7)
    torch.manual_seed(7)

    # --- torch reference model with mmdet naming
    tb = TorchBackbone().eval()
    ts = TorchSharedHead().eval()
    tr = TorchRPNHead().eval()
    th = TorchSelsaFcs().eval()
    randomize_bn(tb, rng)
    randomize_bn(ts, rng)
    sd = {}
    for prefix, m in (("backbone", tb), ("shared_head", ts),
                      ("rpn_head", tr), ("bbox_head", th)):
        sd.update({f"{prefix}.{k}": v.detach().numpy()
                   for k, v in m.state_dict().items()
                   if "num_batches_tracked" not in k})
    loaded = convert_torch_checkpoint(sd)

    engine = SelsaRCNN(_model_cfg(), None, _test_cfg())
    params = engine.init_params(jax.random.PRNGKey(0))
    merged, missing = merge_params(params["params"], loaded["params"])
    assert not missing, missing[:8]
    params = {"params": merged}

    imgs = rng.normal(size=(T, H, W, 3)).astype(np.float32)
    pad_shape = (float(H), float(W))   # == canvas → all anchors valid

    # ------------------------------------------------------------- jax path
    feats = [engine.frame_features(params, jnp.asarray(imgs[t:t + 1]),
                                   IMG_SHAPE, pad_shape) for t in range(T)]
    fc1 = jnp.stack([f["fc1"] for f in feats])
    boxes = jnp.stack([f["boxes"] for f in feats])
    masks = jnp.stack([f["mask"] for f in feats])
    dets_j, labels_j, mask_j = engine.window_detect(
        params, fc1, boxes, masks, IMG_SHAPE, SCALE)
    got_d = np.asarray(dets_j)[np.asarray(mask_j)]
    got_l = np.asarray(labels_j)[np.asarray(mask_j)]

    # ---------------------------------------------------------- oracle path
    gen = AnchorGenerator(16, (4, 8, 16, 32), (0.5, 1.0, 2.0))
    p = to_np(params["params"])
    frame_boxes, frame_pooled, frame_nvalid = [], [], []
    with torch.no_grad():
        for t in range(T):
            x = torch.from_numpy(imgs[t:t + 1].transpose(0, 3, 1, 2))
            c4 = tb(x)
            c5 = ts(c4).numpy().transpose(0, 2, 3, 1)     # NHWC
            cls_map, reg_map = tr(c4)
            # anchor-major flatten: index = ((y*W)+x)*A + a (rpn_head.py:69-76)
            scores = 1.0 / (1.0 + np.exp(
                -cls_map.numpy().transpose(0, 2, 3, 1).reshape(-1)))
            deltas = reg_map.numpy().transpose(0, 2, 3, 1).reshape(-1, 4)
            fh, fw = c4.shape[2], c4.shape[3]
            anchors = gen.grid_anchors((fh, fw), 16)
            order = np.argsort(-scores)[:RPN_CFG["nms_pre"]]
            props = np_delta2bbox(anchors[order].astype(np.float64),
                                  deltas[order], (0., 0., 0., 0.),
                                  (1., 1., 1., 1.), IMG_SHAPE)
            keep = greedy_nms_np(props.astype(np.float32), scores[order],
                                 RPN_CFG["nms_thr"])[:RPN_CFG["nms_post"]]
            kept = props[keep].astype(np.float32)
            rois = np.concatenate([np.zeros((len(kept), 1), np.float32), kept],
                                  axis=1)
            pooled = roi_align_np(c5, rois, 7, 1.0 / 16.0, 2)
            frame_boxes.append(kept)
            frame_pooled.append(pooled)
            frame_nvalid.append(len(kept))

    # the static path's slot layout must mark exactly these rows valid
    for t in range(T):
        m = np.asarray(masks[t])
        assert m.sum() == frame_nvalid[t]
        np.testing.assert_allclose(np.asarray(boxes[t])[m], frame_boxes[t],
                                   rtol=1e-3, atol=5e-3)

    pooled_all = np.concatenate(frame_pooled, axis=0)
    x = pooled_all.reshape(pooled_all.shape[0], -1).astype(np.float64)  # HWC
    fc1_np = np_linear(p["bbox_head"]["fc_new_1"], x)
    att1 = np_nl_block(p["bbox_head"]["selsa_1"], fc1_np, fc1_np, D)
    fc_all_1 = relu(fc1_np + att1)
    fc2 = np_linear(p["bbox_head"]["fc_new_2"], fc_all_1)
    s = sum(frame_nvalid[:INTERVAL])
    l = frame_nvalid[INTERVAL]
    att2 = np_nl_block(p["bbox_head"]["selsa_2"], fc2[s:s + l], fc2, D)
    fc_all_2 = relu(fc2[s:s + l] + att2)
    cls = np_linear(p["bbox_head"]["fc_cls"], fc_all_2)
    reg = np_linear(p["bbox_head"]["fc_reg"], fc_all_2)

    scores = np.exp(cls - cls.max(axis=1, keepdims=True))
    scores /= scores.sum(axis=1, keepdims=True)
    bboxes = np_delta2bbox(frame_boxes[INTERVAL].astype(np.float64), reg,
                           (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2), IMG_SHAPE)
    bboxes = bboxes / SCALE[0]
    ref_d, ref_l = multiclass_nms_np(bboxes.astype(np.float32),
                                     scores.astype(np.float32),
                                     RCNN_CFG["score_thr"],
                                     RCNN_CFG["nms"]["iou_thr"],
                                     RCNN_CFG["max_per_img"])

    assert got_d.shape[0] == ref_d.shape[0] > 0
    o1 = np.lexsort((got_l, -got_d[:, -1]))
    o2 = np.lexsort((ref_l, -ref_d[:, -1]))
    np.testing.assert_array_equal(got_l[o1], ref_l[o2])
    np.testing.assert_allclose(got_d[o1], ref_d[o2], rtol=2e-3, atol=5e-3)
