"""Batched lockstep runner: window schedule correctness + equality with the
sequential runner on the mini dataset."""
import os.path as osp

import numpy as np
import pytest

from hvrnet_tpu.engine.batched_runner import make_window_schedule
from tests.test_vid_dataset import TEST_PIPELINE, mini_vid  # noqa: F401


def simulate_reference_loop(offsets, T):
    """Direct transliteration of the reference deque loop's emissions
    (tools/test.py:201-294) — independent oracle for the schedule."""
    from collections import deque
    half = (T + 1) // 2
    L = len(offsets)
    window = deque(maxlen=T)
    emitted = []
    for i, off in enumerate(offsets):
        if i == 0:
            while len(window) < half:
                window.append(off)
        elif i < L - 1:
            window.append(off)
            if len(window) == T:
                emitted.append(window[half - 1])
        else:
            while len(window) < T - 1:
                window.append(off)
            cnt = 0
            while cnt < min(L, half):
                window.append(off)
                cnt += 1
                emitted.append(window[half - 1])
    return emitted


@pytest.mark.parametrize("L", [1, 2, 3, 5, 10, 11, 15, 21, 30, 50])
@pytest.mark.parametrize("T", [3, 21])
def test_schedule_matches_reference_loop(L, T):
    if L < 2:
        pytest.skip("reference loop needs ≥2 frames (start + end flags)")
    rng = np.random.default_rng(L * 100 + T)
    offsets = list(rng.permutation(L))
    actions = make_window_schedule(offsets, T)
    emitted = [e for _, _, e in actions if e is not None]
    ref = simulate_reference_loop(offsets, T)
    assert emitted == ref
    # every frame of the video gets exactly one emission
    assert sorted(emitted) == sorted(offsets)


def test_parallel_loader_equals_sequential(mini_vid):  # noqa: F811
    """parallel_test_frame_stream (thread-pool loader) + chunked result
    flushing must reproduce the sequential stream exactly (shuffle off)."""
    import jax
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SelsaRCNN, SlidingWindowRunner
    from hvrnet_tpu.engine.stream import (parallel_test_frame_stream,
                                          test_frame_stream)
    from tests.test_engine_selsa import tiny_selsa_cfg

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    ann = osp.join(mini_vid, "ImageSets/VID_val_videos.txt")

    def mkds():
        return VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                             pipeline=TEST_PIPELINE, test_mode=True,
                             world_size=1, video_shuffle=False)

    seq = SlidingWindowRunner(engine, params, flush_every=1).run(
        test_frame_stream(mkds(), rank=0, max_long=96, max_short=64),
        num_frames=8)
    par = SlidingWindowRunner(engine, params, flush_every=16).run(
        parallel_test_frame_stream(mkds(), rank=0, workers=3,
                                   max_long=96, max_short=64), num_frames=8)
    assert len(seq) == len(par) == 8
    for i, (a, b) in enumerate(zip(seq, par)):
        assert (a is None) == (b is None), i
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(ca, cb, rtol=1e-5, atol=1e-5,
                                       err_msg=str(i))


def test_batched_parallel_u8_equals_default(mini_vid):  # noqa: F811
    """Batched runner with thread-pool loads + uint8 transfer must match its
    own default path (shuffle off, flip_ratio 0 ⇒ deterministic loads)."""
    import jax
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import BatchedSlidingWindowRunner, SelsaRCNN
    from tests.test_engine_selsa import tiny_selsa_cfg

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    ann = osp.join(mini_vid, "ImageSets/VID_val_videos.txt")

    def mkds():
        return VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                             pipeline=TEST_PIPELINE, test_mode=True,
                             world_size=1, video_shuffle=False)

    base = BatchedSlidingWindowRunner(engine, params, batch=2).run(
        mkds(), rank=0, max_long=96, max_short=64)
    fast = BatchedSlidingWindowRunner(engine, params, batch=2,
                                      loader_workers=2, u8_transfer=True).run(
        mkds(), rank=0, max_long=96, max_short=64)
    for i, (a, b) in enumerate(zip(base, fast)):
        assert (a is None) == (b is None), i
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-4,
                                       err_msg=str(i))


def test_u8_transfer_equals_float_path(mini_vid):  # noqa: F811
    """u8_transfer ships uint8 frames and normalizes on device; because the
    pipeline resizes in uint8 before Normalize (like the reference), the
    detections must match the host-normalized float path to fp tolerance,
    including the zero pad beyond img_shape."""
    import jax
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SelsaRCNN, SlidingWindowRunner
    from hvrnet_tpu.engine.stream import parallel_test_frame_stream
    from tests.test_engine_selsa import tiny_selsa_cfg

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    ann = osp.join(mini_vid, "ImageSets/VID_val_videos.txt")

    def mkds():
        return VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                             pipeline=TEST_PIPELINE, test_mode=True,
                             world_size=1, video_shuffle=False)

    f32 = SlidingWindowRunner(engine, params).run(
        parallel_test_frame_stream(mkds(), rank=0, workers=2,
                                   max_long=96, max_short=64), num_frames=8)
    u8 = SlidingWindowRunner(engine, params).run(
        parallel_test_frame_stream(mkds(), rank=0, workers=2, max_long=96,
                                   max_short=64, u8_transfer=True),
        num_frames=8)
    for i, (a, b) in enumerate(zip(f32, u8)):
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-4,
                                       err_msg=str(i))


def test_transfer_batch_equals_per_frame(mini_vid):  # noqa: F811
    """transfer_batch groups B consecutive frames into one H2D stack sliced
    back to per-frame views; every yielded frame (pixels + metadata + order)
    must be bit-identical to the per-frame-transfer path, including the
    tail batch shorter than B."""
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine.stream import parallel_test_frame_stream

    ann = osp.join(mini_vid, "ImageSets/VID_val_videos.txt")

    def mkds():
        return VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                             pipeline=TEST_PIPELINE, test_mode=True,
                             world_size=1, video_shuffle=False)

    for u8, tb in [(True, 3), (False, 4)]:
        base = list(parallel_test_frame_stream(
            mkds(), rank=0, workers=2, max_long=96, max_short=64,
            u8_transfer=u8))
        bat = list(parallel_test_frame_stream(
            mkds(), rank=0, workers=2, max_long=96, max_short=64,
            u8_transfer=u8, transfer_batch=tb))
        assert len(base) == len(bat)
        for i, (a, b) in enumerate(zip(base, bat)):
            assert a["img"].dtype == b["img"].dtype
            np.testing.assert_array_equal(np.asarray(a["img"]),
                                          np.asarray(b["img"]),
                                          err_msg=f"u8={u8} frame {i}")
            for k in ("img_shape", "pad_shape", "scale_factor"):
                np.testing.assert_array_equal(a[k], b[k])
            for k in ("key_frame_flag", "frame_offset", "seg_len",
                      "frame_start_id"):
                assert a[k] == b[k], (i, k)


def test_u8_transfer_honors_engine_img_norm(mini_vid):  # noqa: F811
    """With a NON-default Normalize in the pipeline, the u8 path must use
    the matching engine.img_norm override (tools/test.py wires it from the
    config) — guards against silently normalizing with the default."""
    import jax
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SelsaRCNN, SlidingWindowRunner
    from hvrnet_tpu.engine.stream import parallel_test_frame_stream
    from tests.test_engine_selsa import tiny_selsa_cfg

    mean, std = [10.0, 20.0, 30.0], [2.0, 3.0, 4.0]
    pipe = [dict(t) for t in TEST_PIPELINE]
    for t in pipe:
        if t["type"] == "Normalize":
            t["mean"], t["std"] = mean, std

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    engine.img_norm = dict(mean=tuple(mean), std=tuple(std))
    params = engine.init_params(jax.random.PRNGKey(0))
    ann = osp.join(mini_vid, "ImageSets/VID_val_videos.txt")

    def mkds():
        return VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                             pipeline=pipe, test_mode=True,
                             world_size=1, video_shuffle=False)

    f32 = SlidingWindowRunner(engine, params).run(
        parallel_test_frame_stream(mkds(), rank=0, workers=2,
                                   max_long=96, max_short=64), num_frames=8)
    u8 = SlidingWindowRunner(engine, params).run(
        parallel_test_frame_stream(mkds(), rank=0, workers=2, max_long=96,
                                   max_short=64, u8_transfer=True),
        num_frames=8)
    for i, (a, b) in enumerate(zip(f32, u8)):
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(ca, cb, rtol=1e-4, atol=1e-4,
                                       err_msg=str(i))


def test_batched_equals_sequential(mini_vid):  # noqa: F811
    import jax
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import (BatchedSlidingWindowRunner, SelsaRCNN,
                                   SlidingWindowRunner)
    from hvrnet_tpu.engine.stream import test_frame_stream
    from tests.test_engine_selsa import tiny_selsa_cfg

    model_cfg, test_cfg = tiny_selsa_cfg(window_interval=1, proposals=8)
    engine = SelsaRCNN(model_cfg, None, test_cfg)
    params = engine.init_params(jax.random.PRNGKey(0))
    ann = osp.join(mini_vid, "ImageSets/VID_val_videos.txt")

    # video_shuffle would interleave pipeline RNG draws differently between
    # the two runners (RandomFlip consumes np.random per frame), so the
    # equality check runs unshuffled.
    ds1 = VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                        pipeline=TEST_PIPELINE, test_mode=True, world_size=1,
                        video_shuffle=False)
    seq = SlidingWindowRunner(engine, params).run(
        test_frame_stream(ds1, rank=0, max_long=96, max_short=64),
        num_frames=len(ds1))

    ds2 = VIDSeqDataset(ann_file=ann, img_prefix=mini_vid,
                        pipeline=TEST_PIPELINE, test_mode=True, world_size=1,
                        video_shuffle=False)
    bat = BatchedSlidingWindowRunner(engine, params, batch=2).run(
        ds2, rank=0, max_long=96, max_short=64)

    assert len(seq) == len(bat)
    # vmapped matmuls reassociate float accumulation, so batched results can
    # differ from sequential at the ~1e-4 level; windows/emissions themselves
    # are schedule-exact (test_schedule_matches_reference_loop).
    for i, (a, b) in enumerate(zip(seq, bat)):
        assert (a is None) == (b is None), i
        for ca, cb in zip(a, b):
            assert ca.shape == cb.shape, f"frame {i}"
            np.testing.assert_allclose(ca, cb, rtol=1e-3, atol=5e-3,
                                       err_msg=f"frame {i}")
