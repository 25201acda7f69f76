"""End-to-end smoke: SELSA engine sliding-window inference on random weights.

Mirrors the reference test loop structure (tools/test.py:143-302) on a tiny
canvas/backbone so it runs in seconds on the CPU backend.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvrnet_tpu.engine import SelsaRCNN, SlidingWindowRunner


def tiny_selsa_cfg(window_interval=1, proposals=8):
    model = dict(
        type='SelsaRCNN',
        backbone=dict(type='ResNet', depth=50, num_stages=3, strides=(1, 2, 2),
                      dilations=(1, 1, 1), out_indices=(2,), frozen_stages=1,
                      style='caffe', norm_eval=True),
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
        bbox_head=dict(type='SelsaBBoxHead', sampler_num=proposals,
                       t_dim=3, in_channels=256, num_classes=31,
                       reg_class_agnostic=True),
    )
    t = 2 * window_interval + 1
    test_cfg = dict(
        rpn=dict(nms_pre=200, nms_post=proposals, max_num=proposals,
                 nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(score_thr=0.001, nms=dict(type='nms', iou_thr=0.3),
                  max_per_img=20, key_dim=window_interval),
        bbox_head=dict(sampler_num=proposals, t_dim=t,
                       key_dim=window_interval),
        relation_setup=dict(shuffle=False, video_shuffle=True, has_rpn=True,
                            frame_interval=window_interval, frame_stride=1),
    )
    return model, test_cfg


def synthetic_stream(n_frames, h=96, w=128):
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        img = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        flag = 0 if i == 0 else (1 if i == n_frames - 1 else 2)
        yield dict(img=jnp.asarray(img),
                   img_shape=np.array([h - 10, w - 6], np.float32),
                   pad_shape=np.array([h, w], np.float32),
                   scale_factor=np.array([1.0, 1.0, 1.0, 1.0], np.float32),
                   key_frame_flag=flag, frame_offset=i, seg_len=n_frames,
                   frame_start_id=1)


def test_selsa_sliding_window_end_to_end():
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    runner = SlidingWindowRunner(engine, params)
    assert runner.window == 3

    n = 6
    results = runner.run(synthetic_stream(n), num_frames=n)
    assert all(r is not None for r in results), "every frame must get a result"
    for res in results:
        assert len(res) == 30  # per-class lists
        for cls_dets in res:
            assert cls_dets.shape[1] == 5
            if len(cls_dets):
                # rescaled detections stay within the (unscaled) image bounds
                assert np.isfinite(cls_dets).all()


def test_selsa_window_is_causal_consistent():
    """Same frame cached twice (front padding) must not crash; detections for
    frame 0 come from a window of duplicated frame 0 (test.py:210-213)."""
    model_cfg, test_cfg = tiny_selsa_cfg()
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(1))
    runner = SlidingWindowRunner(engine, params)
    results = runner.run(synthetic_stream(3), num_frames=3)
    assert sum(r is not None for r in results) == 3


def test_cast_head_params_bf16_is_bit_identical():
    """Pre-casting the head kernels to bf16 must match the per-call cast the
    bf16 apply path does anyway (and be a no-op for f32 engines)."""
    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    eng16 = SelsaRCNN(model_cfg, None, test_cfg, dtype=jnp.bfloat16)
    params = eng16.init_params(jax.random.PRNGKey(0))
    cast = eng16.cast_head_params_bf16(params)
    assert cast["params"]["bbox_head"]["fc_new_1"]["kernel"].dtype == jnp.bfloat16
    assert cast["params"]["backbone"]["stem"]["conv"]["kernel"].dtype == jnp.float32

    rng = np.random.default_rng(9)
    T, P = 3, 8
    fc1 = jnp.asarray(rng.normal(size=(T, P, 1024)).astype(np.float32))
    boxes = jnp.asarray(np.concatenate(
        [rng.random((T, P, 2)) * 40, 40 + rng.random((T, P, 2)) * 40],
        axis=-1).astype(np.float32))
    masks = jnp.ones((T, P), bool)
    ish = np.array([86.0, 118.0], np.float32)
    sf = np.ones((4,), np.float32)
    a = eng16.window_detect(params, fc1, boxes, masks, ish, sf)
    b = eng16.window_detect(cast, fc1, boxes, masks, ish, sf)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    engf = SelsaRCNN(model_cfg, None, test_cfg)
    pf = engf.init_params(jax.random.PRNGKey(0))
    assert engf.cast_head_params_bf16(pf) is pf
