"""Cascade / Mask R-CNN family engines: end-to-end shape tests."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine.multi_stage import CascadeRCNN, MaskRCNN
from hvrnet_tpu.models.mask_heads import mask_target, paste_masks_np


def base_cfg(num_stages=1, with_mask=False):
    stage_head = lambda: dict(
        type='SharedFCBBoxHead', in_channels=256, fc_out_channels=32,
        num_classes=11, reg_class_agnostic=False,
        target_means=[0., 0., 0., 0.], target_stds=[0.1, 0.1, 0.2, 0.2])
    cfg = dict(
        type='CascadeRCNN',
        backbone=dict(type='ResNet', depth=50, num_stages=3, strides=(1, 2, 2),
                      dilations=(1, 1, 1), out_indices=(2,), frozen_stages=1,
                      style='caffe', norm_eval=True),
        shared_head=dict(type='ResLayer', depth=50, stage=3, stride=1,
                         dilation=2, style='caffe', norm_eval=True,
                         external_conv=True),
        rpn_head=dict(type='RPNHead', in_channels=1024, feat_channels=32,
                      anchor_scales=[4, 8, 16, 32],
                      anchor_ratios=[0.5, 1.0, 2.0], anchor_strides=[16]),
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
            out_channels=256, featmap_strides=[16],
            feat_from_shared_head=True),
        bbox_head=([stage_head() for _ in range(num_stages)]
                   if num_stages > 1 else stage_head()),
    )
    if with_mask:
        cfg["mask_roi_extractor"] = dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=14, sample_num=2),
            out_channels=256, featmap_strides=[16])
        cfg["mask_head"] = dict(type='FCNMaskHead', num_convs=1,
                                in_channels=256, conv_out_channels=32,
                                num_classes=11)
    return cfg


TEST_CFG = dict(
    rpn=dict(nms_pre=100, nms_post=16, max_num=16, nms_thr=0.7,
             min_bbox_size=0),
    rcnn=dict(score_thr=0.01, nms=dict(type='nms', iou_thr=0.5),
              max_per_img=10))


def test_cascade_three_stage_inference():
    eng = CascadeRCNN(base_cfg(num_stages=3), None, TEST_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 96, 3)).astype(np.float32))
    dets, labels, mask = eng.simple_test(
        params, img, np.array([60.0, 90.0], np.float32),
        np.array([64.0, 96.0], np.float32),
        np.array([1.0] * 4, np.float32))
    assert dets.shape == (10, 5)
    assert np.isfinite(np.asarray(dets)).all()


def test_mask_rcnn_inference_masks():
    eng = MaskRCNN(base_cfg(num_stages=1, with_mask=True), None, TEST_CFG)
    params = eng.init_params(jax.random.PRNGKey(1))
    img = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 64, 96, 3)).astype(np.float32))
    out = eng.simple_test(params, img, np.array([60.0, 90.0], np.float32),
                          np.array([64.0, 96.0], np.float32),
                          np.array([1.0] * 4, np.float32))
    dets, labels, mask, mask_pred = out
    assert mask_pred.shape == (10, 28, 28, 10)
    segms = paste_masks_np(np.asarray(mask_pred),
                           np.asarray(dets)[np.asarray(mask)],
                           np.asarray(labels)[np.asarray(mask)], 60, 90)
    assert len(segms) == 10


def test_mask_target_crops_gt():
    g = np.zeros((2, 32, 32), np.float32)
    g[0, 8:16, 8:24] = 1  # box region
    g[1, :, :] = 1
    rois = jnp.asarray([[0, 8.0, 8.0, 23.0, 15.0],
                        [1, 0.0, 0.0, 31.0, 31.0]])
    t = mask_target(jnp.asarray(g), rois, mask_size=8)
    t = np.asarray(t)
    assert t.shape == (2, 8, 8)
    assert t[0].mean() > 0.8  # roi tightly covers the mask
    np.testing.assert_array_equal(t[1], 1.0)
