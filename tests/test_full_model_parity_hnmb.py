"""End-to-end HVRNet (HNMB) test-path parity vs an independent oracle.

The HNMB analogue of `tests/test_full_model_parity.py` (VERDICT r2 missing
#1): a torch model with the reference's layer naming — backbone stages 1-3,
dilated layer4 shared head + external conv, RPN head, and an HRNMP parameter
container with the reference's head naming (fc_new_1..4, selsa_1..4 blocks,
dual fc_cls/fc_reg + fc_cls_2/fc_reg_2 branches,
`/root/reference/mmdet/models/bbox_heads/hrnmp_bbox_head.py:120-186`) — is
randomly initialized, exported as a reference-style state_dict, and mapped
onto the flax HNMBRCNN engine by `convert_torch_checkpoint`.  The full jax
test path

    frame_features (backbone → shared → RPN → static NMS → RoIAlign → fc1)
    → window_detect (forward_test splice → BOTH branches → get_det_bboxes)

must reproduce an oracle pipeline built from torch activations + the
already-validated numpy oracles (greedy NMS, RoIAlign kernel math, the HRNMP
forward_test equations, reference delta2bbox/multiclass_nms semantics).
Reference path: `hnmb_rcnn.py:571-613` (simple_test_bboxes: per-frame RoI
feats → forward_test → get_det_bboxes on the key frame's rois) +
`hrnmp_bbox_head.py:800-909` (spliced test graph) + `:1009-1052`
(per-branch decode; list scores average, `:1020-1022`).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hvrnet_tpu.engine import HNMBRCNN  # noqa: E402
from hvrnet_tpu.ops.anchors import AnchorGenerator  # noqa: E402
from hvrnet_tpu.utils.checkpoint import (convert_torch_checkpoint,  # noqa: E402
                                         merge_params)
from tests.test_full_model_parity import (RPN_CFG, TorchRPNHead,  # noqa: E402
                                          TorchSharedHead, np_delta2bbox)
from tests.test_head_parity import np_linear, np_nl_block, relu, to_np  # noqa: E402
from tests.test_ops_nms import greedy_nms_np, multiclass_nms_np  # noqa: E402
from tests.test_ops_roi_align import roi_align_np  # noqa: E402
from tests.test_torch_parity import TorchBackbone, randomize_bn  # noqa: E402

D = 64          # fc_feat_dim (equations are dimension-agnostic)
NCLS = 9
P = 8           # proposals/frame == sampler_num (no nongt truncation)
INTERVAL = 2
T = 2 * INTERVAL + 1
H, W = 64, 96
IMG_SHAPE = (60.0, 92.0)
SCALE = np.array([1.25, 1.25, 1.25, 1.25], np.float32)
RCNN_CFG = dict(score_thr=0.01, nms=dict(type="nms", iou_thr=0.3),
                max_per_img=20, key_dim=INTERVAL)


class TorchHrnmpFcs(tnn.Module):
    """Parameter container only (reference hrnmp_bbox_head.py:120-186
    naming); the oracle head math runs in numpy on the converted weights."""

    def __init__(self):
        super().__init__()
        self.fc_new_1 = tnn.Linear(256 * 49, D)
        for i in (2, 3, 4):
            self.add_module(f"fc_new_{i}", tnn.Linear(D, D))
        for i in (1, 2, 3, 4):
            blk = tnn.Module()
            blk.add_module(f"q_data_fc_{i}", tnn.Linear(D, D))
            blk.add_module(f"k_data_fc_{i}", tnn.Linear(D, D))
            blk.add_module(f"linear_out_{i}", tnn.Conv2d(D, D, 1))
            self.add_module(f"selsa_{i}", blk)
        self.fc_cls = tnn.Linear(D, NCLS)      # NL2 branch head
        self.fc_reg = tnn.Linear(D, 4)
        self.fc_cls_2 = tnn.Linear(D, NCLS)    # NL4 final head
        self.fc_reg_2 = tnn.Linear(D, 4)


def _model_cfg():
    return dict(
        type="HNMBRCNN",
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
        bbox_head=dict(type="HRNMPBBoxHead", sampler_num=P, t_dim=T,
                       imgs_per_video=3, fc_feat_dim=D, dim=(D, D, D),
                       in_channels=256, num_classes=NCLS,
                       reg_class_agnostic=True,
                       loss_bbox=dict(type="SmoothL1Loss", beta=1.0)))


def _test_cfg():
    return dict(rpn=RPN_CFG, rcnn=RCNN_CFG,
                bbox_head=dict(sampler_num=P, t_dim=T, key_dim=INTERVAL),
                relation_setup=dict(shuffle=False, video_shuffle=True,
                                    has_rpn=True, frame_interval=INTERVAL,
                                    frame_stride=1))


def _np_softmax(x):
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def np_hrnmp_forward_test(p, pooled_flat, s, l, nongt, dim=None):
    """forward_test (hrnmp_bbox_head.py:800-909) on HWC-flattened pooled
    feats: NL1/NL2 over all rows, branch heads on the key rows, NL3 splice
    (fc1 outside cur / NL2-relu inside, ref:865-868), NL4 key-query pass,
    final heads.  Returns ([cls_branch, cls_final], [reg_branch, reg_final]).
    ``dim`` defaults to this module's tiny D; tools/parity_full_shape.py
    reuses the oracle at the real fc_feat_dim=1024."""
    dim = D if dim is None else dim
    fc1 = np_linear(p["fc_new_1"], pooled_flat)
    att1 = np_nl_block(p["selsa_1"], fc1, fc1[:nongt], dim)
    fc_all_1 = relu(fc1 + att1)
    fc2 = np_linear(p["fc_new_2"], fc_all_1)
    att2 = np_nl_block(p["selsa_2"], fc2, fc2[:nongt], dim)
    fc_all_2 = relu(fc2 + att2)
    branch_in = fc_all_2[s:s + l]
    cls_b = np_linear(p["fc_cls"], branch_in)
    reg_b = np_linear(p["fc_reg"], branch_in)
    fc3_in = np.concatenate([fc1[:s], fc_all_2[s:s + l], fc1[s + l:]], axis=0)
    fc3 = np_linear(p["fc_new_3"], fc3_in)
    att3 = np_nl_block(p["selsa_3"], fc3, fc3[:nongt], dim)
    fc_all_3 = relu(fc3 + att3)
    fc4 = np_linear(p["fc_new_4"], fc_all_3)
    att4 = np_nl_block(p["selsa_4"], fc4[s:s + l], fc4[:nongt], dim)
    fc_all_4 = relu(fc4[s:s + l] + att4)
    cls_f = np_linear(p["fc_cls_2"], fc_all_4)
    reg_f = np_linear(p["fc_reg_2"], fc_all_4)
    return [cls_b, cls_f], [reg_b, reg_f]


def test_full_hnmb_test_path_matches_oracle():
    rng = np.random.default_rng(11)
    torch.manual_seed(11)

    # --- torch reference model with mmdet naming
    tb = TorchBackbone().eval()
    ts = TorchSharedHead().eval()
    tr = TorchRPNHead().eval()
    th = TorchHrnmpFcs().eval()
    randomize_bn(tb, rng)
    randomize_bn(ts, rng)
    sd = {}
    for prefix, m in (("backbone", tb), ("shared_head", ts),
                      ("rpn_head", tr), ("bbox_head", th)):
        sd.update({f"{prefix}.{k}": v.detach().numpy()
                   for k, v in m.state_dict().items()
                   if "num_batches_tracked" not in k})
    loaded = convert_torch_checkpoint(sd)

    engine = HNMBRCNN(_model_cfg(), None, _test_cfg())
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
    got = engine.window_detect(params, fc1, boxes, masks, IMG_SHAPE, SCALE,
                               branch=None)          # BOTH branches decoded
    assert len(got) == 2

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
    s = sum(frame_nvalid[:INTERVAL])
    l = frame_nvalid[INTERVAL]
    nongt = sum(frame_nvalid)            # every valid row is a key
    cls_list, reg_list = np_hrnmp_forward_test(p["bbox_head"], x, s, l, nongt)

    key_boxes = frame_boxes[INTERVAL].astype(np.float64)
    for b, (cls, reg) in enumerate(zip(cls_list, reg_list)):
        scores = _np_softmax(cls)
        bboxes = np_delta2bbox(key_boxes, reg, (0., 0., 0., 0.),
                               (0.1, 0.1, 0.2, 0.2), IMG_SHAPE) / SCALE[0]
        ref_d, ref_l = multiclass_nms_np(bboxes.astype(np.float32),
                                         scores.astype(np.float32),
                                         RCNN_CFG["score_thr"],
                                         RCNN_CFG["nms"]["iou_thr"],
                                         RCNN_CFG["max_per_img"])
        dets_j, labels_j, mask_j = got[b]
        got_d = np.asarray(dets_j)[np.asarray(mask_j)]
        got_l = np.asarray(labels_j)[np.asarray(mask_j)]
        assert got_d.shape[0] == ref_d.shape[0] > 0, f"branch {b}"
        o1 = np.lexsort((got_l, -got_d[:, -1]))
        o2 = np.lexsort((ref_l, -ref_d[:, -1]))
        np.testing.assert_array_equal(got_l[o1], ref_l[o2],
                                      err_msg=f"branch {b}")
        np.testing.assert_allclose(got_d[o1], ref_d[o2], rtol=2e-3, atol=5e-3,
                                   err_msg=f"branch {b}")


def test_full_hnmb_averaged_scores_match_oracle():
    """`get_det_bboxes` list-score averaging (`hrnmp_bbox_head.py:1020-1022`:
    ``cls_score = sum(cls_score)/len(cls_score)``) through the converted
    engine: decoding with BOTH branch logits as one averaged score set must
    match the numpy average + oracle NMS."""
    rng = np.random.default_rng(13)
    torch.manual_seed(13)
    th = TorchHrnmpFcs().eval()
    sd = {f"bbox_head.{k}": v.detach().numpy()
          for k, v in th.state_dict().items()}
    loaded = convert_torch_checkpoint(sd)

    from hvrnet_tpu.models import HRNMPBBoxHead
    from hvrnet_tpu.models.bbox_heads.bbox_head import get_det_bboxes
    head = HRNMPBBoxHead(sampler_num=P, t_dim=T, imgs_per_video=3,
                         fc_feat_dim=D, dim=(D, D, D), in_channels=256,
                         num_classes=NCLS, reg_class_agnostic=True)
    N = T * P
    feats = jnp.asarray(rng.normal(size=(N, 7, 7, 256)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), feats, 0, P)
    merged, missing = merge_params(params["params"],
                                   loaded["params"]["bbox_head"])
    assert not missing, missing[:8]
    params = {"params": merged}

    s, l = INTERVAL * P, P
    cls_list, reg_list = head.apply(params, feats, s, l)
    key_boxes = np.abs(rng.normal(size=(P, 4))).astype(np.float32) * 8
    key_boxes[:, 2:] += key_boxes[:, :2] + 4
    dets_j, labels_j, mask_j = get_det_bboxes(
        jnp.asarray(key_boxes), list(cls_list), reg_list[-1],
        jnp.asarray(IMG_SHAPE), SCALE, (0., 0., 0., 0.),
        (0.1, 0.1, 0.2, 0.2), rescale=True, cfg=RCNN_CFG)
    got_d = np.asarray(dets_j)[np.asarray(mask_j)]
    got_l = np.asarray(labels_j)[np.asarray(mask_j)]

    p = to_np(params["params"])
    x = np.asarray(feats, np.float64).reshape(N, -1)
    ref_cls, ref_reg = np_hrnmp_forward_test(p, x, s, l, N)
    scores = _np_softmax((ref_cls[0] + ref_cls[1]) / 2.0)
    bboxes = np_delta2bbox(key_boxes.astype(np.float64), ref_reg[1],
                           (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2),
                           IMG_SHAPE) / SCALE[0]
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
