"""HVRNet (HNMB) engine: sliding-window inference with the 4-block head."""
import numpy as np
import jax
import jax.numpy as jnp

from hvrnet_tpu.engine import HNMBRCNN, SlidingWindowRunner
from tests.test_engine_selsa import synthetic_stream


def tiny_hnmb_cfg(window_interval=1, proposals=8):
    t = 2 * window_interval + 1
    model = dict(
        type='HNMBRCNN',
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
        bbox_head=dict(type='HRNMPBBoxHead', sampler_num=proposals,
                       t_dim=3, imgs_per_video=3, in_channels=256,
                       num_classes=31, reg_class_agnostic=True),
    )
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


def test_hnmb_sliding_window_both_branches():
    model_cfg, test_cfg = tiny_hnmb_cfg()
    engine = HNMBRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))

    # final branch (default, stored for mAP)
    runner = SlidingWindowRunner(engine, params, branch=-1)
    n = 5
    results = runner.run(synthetic_stream(n), num_frames=n)
    assert all(r is not None for r in results)
    assert all(len(r) == 30 for r in results)

    # NL2 branch differs from the final branch
    runner0 = SlidingWindowRunner(engine, params, branch=0)
    results0 = runner0.run(synthetic_stream(n), num_frames=n)
    flat = np.concatenate([np.concatenate([c.reshape(-1) for c in r])
                           for r in results])
    flat0 = np.concatenate([np.concatenate([c.reshape(-1) for c in r])
                            for r in results0])
    if flat.size and flat0.size:
        assert flat.shape != flat0.shape or not np.allclose(flat, flat0)


def test_hnmb_multi_pass_window():
    """engine.multi_pass=P runs the head's multi-pass test graph
    (forward_test_multi_passes): one prediction set per frame, and the
    results differ from the spliced single-pass graph (different network)."""
    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=1, proposals=8)
    window = 9   # 3 passes × 3 frames
    test_cfg["bbox_head"]["t_dim"] = window
    test_cfg["bbox_head"]["key_dim"] = (window - 1) // 2
    engine = HNMBRCNN(model_cfg, None, test_cfg)
    engine.window = window
    engine.key_dim = (window - 1) // 2
    params = engine.init_params(jax.random.PRNGKey(2))
    n = 11

    engine.multi_pass = 3
    runner = SlidingWindowRunner(engine, params, window=window, branch=-1)
    results = runner.run(synthetic_stream(n), num_frames=n)
    assert all(r is not None for r in results)
    assert all(len(r) == 30 for r in results)

    engine.multi_pass = None
    runner1 = SlidingWindowRunner(engine, params, window=window, branch=-1)
    results1 = runner1.run(synthetic_stream(n), num_frames=n)
    flat = np.concatenate([np.concatenate([c.reshape(-1) for c in r])
                           for r in results])
    flat1 = np.concatenate([np.concatenate([c.reshape(-1) for c in r])
                            for r in results1])
    if flat.size and flat1.size:
        assert flat.shape != flat1.shape or not np.allclose(flat, flat1)


def test_hnmb_extended_window_point():
    """The 63-frame-analog operating point (SURVEY §3.2): cache length and
    head t_dim derived as one quantity (here 9 = 3 branches × base window 3,
    key_dim 4), the way tools/hnl_test.py rebuilds the head for --window."""
    model_cfg, test_cfg = tiny_hnmb_cfg(window_interval=1, proposals=8)
    window = 9
    test_cfg["bbox_head"]["t_dim"] = window
    test_cfg["bbox_head"]["key_dim"] = (window - 1) // 2
    engine = HNMBRCNN(model_cfg, None, test_cfg)
    engine.window = window
    engine.key_dim = (window - 1) // 2
    params = engine.init_params(jax.random.PRNGKey(1))
    # head t_dim follows the override → nongt covers the full 9×8 rows
    assert engine.model_cfg["bbox_head"]["t_dim"] == window

    runner = SlidingWindowRunner(engine, params, window=window, branch=-1)
    n = 11
    results = runner.run(synthetic_stream(n), num_frames=n)
    assert all(r is not None for r in results)
    assert all(len(r) == 30 for r in results)
