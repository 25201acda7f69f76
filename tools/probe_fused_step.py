"""Interleaved A/B: split (backbone | post | ring_step) vs fused
(backbone | post+ring_step) per-frame program structure.

Round-4 verdict weak #1: ~1.5-2 ms/frame sits between the traced op total
(≈3.9 ms) and bench wall (≈5.2-6.0 ms).  The 3-programs-per-frame structure
was last litigated in round 1, before the fixpoint NMS and the head-subtree
param split changed both sides of the trade; `ring_step_fused` re-tries
folding the post program (proposals+RoIAlign+fc1) into the window stage —
one fewer dispatch per frame and one fewer intermediate (fc1 etc.) HBM
round trip.

Protocol per CLAUDE.md measurement rules: INTERLEAVED same-process windows
(A window, B window, repeat), N dispatches → ONE block, unique frames,
best-of per variant.
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["selsa", "hvrnet"], default="hvrnet")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--frames", type=int, default=60, help="frames/window")
    ap.add_argument("--reps", type=int, default=4, help="windows/variant")
    ap.add_argument("--exact", action="store_true",
                    help="exact ring instead of the streaming default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from bench import build_engine

    stream = (args.model == "hvrnet") and not args.exact
    engine = build_engine(args.model, window=args.window, stream=stream)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    params = engine.cast_head_params_bf16(params)
    params = jax.device_put(params, jax.devices()[0])

    H, W = 608, 1008
    T = engine.window
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
            for _ in range(8)]
    img_shape = np.array([600.0, 1000.0], np.float32)
    pad_shape = np.array([608.0, 1008.0], np.float32)
    scale_factor = np.array([1.67, 1.67, 1.67, 1.67], np.float32)
    ish = jnp.asarray(img_shape)
    psh = jnp.asarray(pad_shape)
    sfd = jnp.asarray(scale_factor)
    branch = -1 if getattr(engine, "multi_branch", False) else None

    @jax.jit
    def next_frame(base, c):
        return base + c * 1e-30, c + 1.0

    # warm / compile both variants
    t0 = time.time()
    feats = engine.frame_features(params, imgs[0], img_shape, pad_shape)
    jax.block_until_ready(feats)
    state = engine.ring_reset(int(feats["fc1"].shape[-1]))
    for _ in range(T):
        state = engine.ring_push(state, feats, params=params)
    state, out = engine.ring_step(params, state, feats, ish, sfd,
                                  branch=branch)
    jax.block_until_ready(out)
    t_split_compile = time.time() - t0
    t0 = time.time()
    c5, cm, rm = engine._backbone_dispatch(params, imgs[0], img_shape)
    state, out = engine.ring_step_fused(params, state, c5, cm, rm, ish, psh,
                                        sfd, branch=branch)
    jax.block_until_ready(out)
    t_fused_compile = time.time() - t0
    print(json.dumps(dict(section="compile_s",
                          split=round(t_split_compile, 1),
                          fused=round(t_fused_compile, 1))))

    n = args.frames
    counter = jnp.float32(0.0)
    best = {"split": np.inf, "fused": np.inf}
    times = {"split": [], "fused": []}
    for rep in range(args.reps):
        for variant in ("split", "fused"):
            t0 = time.perf_counter()
            if variant == "split":
                for i in range(n):
                    frame, counter = next_frame(imgs[i % 8], counter)
                    f = engine.frame_features(params, frame, img_shape,
                                              pad_shape)
                    state, out = engine.ring_step(params, state, f, ish, sfd,
                                                  branch=branch)
            else:
                for i in range(n):
                    frame, counter = next_frame(imgs[i % 8], counter)
                    c5, cm, rm = engine._backbone_dispatch(params, frame,
                                                           img_shape)
                    state, out = engine.ring_step_fused(
                        params, state, c5, cm, rm, ish, psh, sfd,
                        branch=branch)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n * 1e3
            times[variant].append(round(dt, 3))
            best[variant] = min(best[variant], dt)
    print(json.dumps(dict(
        section="fused_vs_split", model=args.model, window=T,
        stream=stream, frames_per_window=n,
        ms_per_frame_split=round(best["split"], 3),
        ms_per_frame_fused=round(best["fused"], 3),
        fps_split=round(1e3 / best["split"], 1),
        fps_fused=round(1e3 / best["fused"], 1),
        windows_split=times["split"], windows_fused=times["fused"])))


if __name__ == "__main__":
    main()
