"""Probe: batched multi-stream device path vs the sequential runner.

Measures the steady-state per-frame device cost of the lockstep B-stream
path (`frame_features_batched` + `ring_push_batched` + `ring_detect_batched`
per step, one frame per stream — engine/batched_runner.py) against the
single-stream path (`frame_features` + fused `ring_step`), at the standard
608×1008 / 21-window SELSA operating point (tools/test.py:758 semantics).

This is the measurement behind BASELINE.md's batched-streams row: batching
exists to amortize the latency-bound NMS pick loops, which the shared-lane
pick loop (`ops/nms.py:nms_static_lanes`) runs ONCE per step for all lanes.

Usage:  python tools/probe_batched.py [--model selsa] [--frames 60]
Prints one line per batch size; obeys the tunnel measurement rules
(dispatch N steps, block once, best of 3 windows).
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["selsa", "hvrnet"], default="selsa")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 4, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_engine
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    engine = build_engine(args.model)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    params = engine.cast_head_params_bf16(params)
    params = jax.device_put(params, jax.devices()[0])

    H, W = 608, 1008
    rng = np.random.default_rng(0)
    img1 = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    ish1 = np.array([600.0, 1000.0], np.float32)
    psh1 = np.array([608.0, 1008.0], np.float32)
    sf1 = np.array([1.67] * 4, np.float32)
    branch = -1 if getattr(engine, "multi_branch", False) else None
    n = args.frames

    # INTERLEAVED windows (CLAUDE.md measurement rules): tenancy on the
    # shared tunnel swings several-fold over minutes, so each repetition
    # measures the sequential path and every batch size back-to-back and
    # the per-variant best is taken across repetitions.
    img = jnp.asarray(img1)
    ish = jnp.asarray(ish1)
    sfd = jnp.asarray(sf1)
    feats = engine.frame_features(params, img, ish1, psh1)
    state = engine.ring_reset(int(feats["fc1"].shape[-1]))
    for _ in range(engine.window):
        state = engine.ring_push(state, feats, params=params)
    state, out = engine.ring_step(params, state, feats, ish, sfd,
                                  branch=branch)
    jax.block_until_ready(out)

    bstates = {}
    binputs = {}
    for B in args.batches:
        imgs = jnp.asarray(np.broadcast_to(img1[0], (B, H, W, 3)).copy())
        ishs = np.broadcast_to(ish1, (B, 2)).copy()
        pshs = np.broadcast_to(psh1, (B, 2)).copy()
        sfs = np.broadcast_to(sf1, (B, 4)).copy()
        resets = jnp.zeros(B, bool)
        fb = engine.frame_features_batched(params, imgs, ishs, pshs)
        bstate = engine.ring_reset_batched(B, int(fb["fc1"].shape[-1]))
        for _ in range(engine.window):
            bstate = engine.ring_push_batched(bstate, fb, resets)
        out = engine.ring_detect_batched(params, bstate, ishs, sfs)
        if isinstance(out, list):
            out = out[-1]
        jax.block_until_ready(out)
        bstates[B] = bstate
        binputs[B] = (imgs, ishs, pshs, sfs, resets)

    seq = 1e9
    best = {B: 1e9 for B in args.batches}
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            feats = engine.frame_features(params, img, ish1, psh1)
            state, out = engine.ring_step(params, state, feats, ish, sfd,
                                          branch=branch)
        jax.block_until_ready(out)
        seq = min(seq, (time.perf_counter() - t0) / n * 1e3)
        for B in args.batches:
            imgs, ishs, pshs, sfs, resets = binputs[B]
            bstate = bstates[B]
            steps = max(n // B, 10)
            t0 = time.perf_counter()
            for _ in range(steps):
                fb = engine.frame_features_batched(params, imgs, ishs, pshs)
                bstate = engine.ring_push_batched(bstate, fb, resets)
                out = engine.ring_detect_batched(params, bstate, ishs, sfs)
                if isinstance(out, list):
                    out = out[-1]
            jax.block_until_ready(out)
            bstates[B] = bstate
            best[B] = min(best[B], (time.perf_counter() - t0)
                          / (steps * B) * 1e3)

    print(f"sequential: {seq:.2f} ms/frame ({1e3 / seq:.1f} fps)",
          flush=True)
    for B in args.batches:
        print(f"batched B={B}: {best[B]:.2f} ms/frame "
              f"({1e3 / best[B]:.1f} fps, {seq / best[B]:.2f}x sequential)",
              flush=True)


if __name__ == "__main__":
    main()
