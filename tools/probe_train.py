"""Sustained train-step probe on the real TPU (BASELINE.md methodology).

Builds the config's trainer at the full 608×1008 canvas with synthetic
batches matching the reference batch shapes (HVRNet: cfg selsa_imgs = 27
collated frames = 9 triplet-pool videos × 3 frames; SELSA: 3 frames),
dispatches N donated steps back-to-back and blocks once — the
tunnel-robust measurement.

Usage: python tools/probe_train.py [--model hvrnet|selsa] [--steps 15]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_batch(rng, frames, h, w):
    """One training sample in the trainer's layout — reuses the canonical
    fixture (tests/test_train_step.py:make_sample) so the probe can never
    drift from the batch contract the tests pin down."""
    import importlib.util
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_train_step_fixture", osp.join(root, "tests", "test_train_step.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_sample(rng, frames, h=h, w=w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["hvrnet", "selsa"], default="hvrnet")
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 1008))
    ap.add_argument("--frames", type=int, default=0,
                    help="override the config-derived collated frame count "
                         "(0 = use cfg.data.selsa_imgs: 27 for HVRNet, 3 "
                         "for SELSA)")
    ap.add_argument("--bf16", action="store_true",
                    help="engine dtype=bfloat16 (the tools/train.py --bf16 "
                         "path); params stay f32, compute casts to bf16")
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace of the sustained loop "
                         "to this directory")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from hvrnet_tpu.apis import build_trainer
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.config import Config

    cfgf = ("configs/faster_rcnn_r101_hrnmp_c5.py" if args.model == "hvrnet"
            else "configs/faster_rcnn_r101_selsa_c5.py")
    cfg = Config.fromfile(osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), cfgf))
    engine = build_detector(
        cfg.model, cfg.train_cfg, None,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    trainer = build_trainer(engine, cfg)

    h, w = args.canvas
    rng = np.random.default_rng(0)
    # The reference recipe's collated frame count is the config's selsa_imgs
    # (`faster_rcnn_r101_hrnmp_c5.py:14`: 27 = 9 triplet videos × 3 frames —
    # 3 same-class videos + extra_cls=2 classes × video_per_cls=3, the
    # sample_videos pool at `imagenet_vid_sequence.py:164-183`; SELSA: 3).
    # Round 3 probed a reduced 15-frame (5-video) pool here — corrected.
    frames = int(cfg.data.get("selsa_imgs", 3))
    if args.frames:
        frames = args.frames
    videos = frames // 3
    print(f"{args.model}: {frames} frames ({videos} videos) @ {h}x{w}",
          flush=True)

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    state = trainer.create_state(params)
    state = jax.device_put(state, jax.devices()[0])
    step = trainer.make_train_step(h, w)

    batch = jax.device_put(make_batch(rng, frames, h, w), jax.devices()[0])
    t0 = time.perf_counter()
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(logs)
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s; "
          f"loss {float(logs['loss']):.3f}", flush=True)

    n = args.steps
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for i in range(n):
        state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(logs)
    dt = (time.perf_counter() - t0) / n * 1e3
    if args.trace:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", flush=True)
    print(f"sustained: {dt:.1f} ms/step ({1e3/dt:.1f} steps/s, "
          f"{frames*1e3/dt:.1f} frames/s) loss {float(logs['loss']):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
