"""Benchmark: SELSA R101-C5 video-detection inference throughput per chip.

Measures the steady-state cost of one output frame at the reference operating
point (`/root/reference/tools/test.py:758`, `configs/faster_rcnn_r101_selsa_c5.py`):
(1000, 600) keep-ratio input on the 608×1008 static canvas, R101-C4 backbone +
dilated-C5 shared head, 6000→300 proposal RPN with static NMS, RoIAlign 7×7,
21-frame × 300-proposal SELSA attention (6300 tokens), per-class NMS to 300
detections.  Per output frame the pipeline runs exactly one frame_features
call (backbone+RPN+RoIAlign+fc1, cached) and one window_detect call — the
TPU-first restructuring of the reference loop which recomputes shared-head,
RPN and RoIAlign over all 21 frames per output frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to the 4 fps/GPU reference-implementation proxy
recorded in BASELINE.md (no fps is published in the reference repo).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 4.0  # documented proxy (BASELINE.md): reference impl. per GPU


def main():
    import os
    import jax
    import jax.numpy as jnp
    os.makedirs("/tmp/hvrnet_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from hvrnet_tpu.engine import SelsaRCNN
    from hvrnet_tpu.utils.config import Config

    cfg = Config.fromfile("configs/faster_rcnn_r101_selsa_c5.py")
    engine = SelsaRCNN(cfg.model, None, cfg.test_cfg,
                       dtype=jnp.bfloat16)
    # parameter init runs on the host CPU backend (hundreds of tiny programs
    # are slow over the device tunnel), then transfers once.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])

    H, W = 608, 1008
    T = engine.window  # 21
    P = engine.proposal_num  # 300
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    img_shape = np.array([600.0, 1000.0], np.float32)
    pad_shape = np.array([608.0, 1008.0], np.float32)
    scale_factor = np.array([1.67, 1.67, 1.67, 1.67], np.float32)

    # warm up / compile (device-resident ring buffer, one push + one detect
    # dispatch per frame — the real runner's steady state)
    ish = jnp.asarray(img_shape)
    sfd = jnp.asarray(scale_factor)
    feats = engine.frame_features(params, img, img_shape, pad_shape)
    jax.block_until_ready(feats)
    state = engine.ring_reset(int(feats["fc1"].shape[-1]))
    for _ in range(T):
        state = engine.ring_push(state, feats)
    state, out = engine.ring_step(params, state, feats, ish, sfd)
    jax.block_until_ready(out)

    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        feats = engine.frame_features(params, img, img_shape, pad_shape)
        state, out = engine.ring_step(params, state, feats, ish, sfd)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "selsa_r101_vid_inference_throughput",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
