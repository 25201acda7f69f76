"""Zoo-parity modules: shape/finiteness checks for FPN, ConvFC heads,
RetinaNet/FCOS heads and the single-stage engine."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.models import (FPN, ConvFCBBoxHead, FCOSHead, RetinaHead,
                               SharedFCBBoxHead)
from hvrnet_tpu.engine.single_stage import RetinaNet


def test_fpn_shapes():
    fpn = FPN(in_channels=(8, 16, 32, 64), out_channels=8, num_outs=5,
              add_extra_convs=True)
    feats = tuple(jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), c))
                  for i, c in enumerate((8, 16, 32, 64)))
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 8)
    assert outs[4].shape == (1, 2, 2, 8)


def test_shared_fc_bbox_head():
    head = SharedFCBBoxHead(in_channels=16, num_classes=31, fc_out_channels=32,
                            reg_class_agnostic=False)
    x = jnp.zeros((4, 7, 7, 16))
    params = head.init(jax.random.PRNGKey(0), x)
    cls, reg = head.apply(params, x)
    assert cls.shape == (4, 31)
    assert reg.shape == (4, 124)


def test_retina_head_levels():
    head = RetinaHead(num_classes=11, in_channels=8, feat_channels=8,
                      stacked_convs=1)
    feats = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 8))]
    params = head.init(jax.random.PRNGKey(0), feats)
    cls_outs, reg_outs = head.apply(params, feats)
    assert len(cls_outs) == 2
    assert cls_outs[0].shape == (1, 16, 16, 9 * 10)  # 9 anchors × 10 fg classes
    assert reg_outs[0].shape == (1, 16, 16, 36)


def test_fcos_head_levels():
    head = FCOSHead(num_classes=11, in_channels=8, feat_channels=8,
                    stacked_convs=1, strides=(8, 16))
    feats = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 8))]
    params = head.init(jax.random.PRNGKey(0), feats)
    cls_outs, reg_outs, ctr_outs = head.apply(params, feats)
    assert cls_outs[0].shape == (1, 16, 16, 10)
    assert reg_outs[0].shape == (1, 16, 16, 4)
    assert (np.asarray(reg_outs[0]) >= 0).all()  # exp-scaled distances
    assert ctr_outs[1].shape == (1, 8, 8, 1)


def test_retinanet_engine_end_to_end():
    model_cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=50, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style='pytorch', norm_eval=True),
        neck=dict(type='FPN', in_channels=(256, 512, 1024, 2048),
                  out_channels=32, num_outs=5, add_extra_convs=True),
        bbox_head=dict(type='RetinaHead', num_classes=11, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       octave_base_scale=4, scales_per_octave=3,
                       anchor_ratios=[0.5, 1.0, 2.0],
                       anchor_strides=[8, 16, 32, 64, 128]))
    test_cfg = dict(nms_pre=100, score_thr=0.05,
                    nms=dict(type='nms', iou_thr=0.5), max_per_img=20)
    eng = RetinaNet(model_cfg, None, test_cfg)
    params = eng.init_params(jax.random.PRNGKey(0), (64, 64))
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 64, 3)).astype(np.float32))
    dets, labels, mask = eng.simple_test(
        params, img, np.array([64.0, 64.0], np.float32),
        np.array([1.0, 1.0, 1.0, 1.0], np.float32))
    assert dets.shape == (20, 5)
    assert np.isfinite(np.asarray(dets)).all()
