"""Phase probe: isolated device time of each steady-state program.

The whole-frame cost decomposes into three programs (BASELINE.md §MFU):

* A: backbone C4 + dilated C5 + RPN maps (`engine._frame_backbone_fn`)
* B: proposals NMS + RoIAlign + fc1 (`engine._frame_post_fn` minus A)
* C: fused ring push + relation head + decode (`engine.ring_step`)

Each phase dispatches N chained iterations (distinct argument buffers each
call) and blocks once, and the three phases are measured in INTERLEAVED
windows so tenancy applies to all of them equally — the tunnel-robust
methodology (CLAUDE.md measurement rules).  Phase B is reported as
(A+B) − A since the post program consumes A's outputs.

Usage: python tools/probe_phases.py [--model hvrnet] [--iters 100]
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
    ap.add_argument("--model", choices=["hvrnet", "selsa"], default="hvrnet")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--trace", nargs="?", const="/tmp/jaxtrace_phases",
                    default=None, metavar="DIR",
                    help="after the timed windows, capture one extra "
                         "interleaved window under jax.profiler.trace and "
                         "print tools/trace_report.py's per-module table — "
                         "the only trustworthy absolute device-time source "
                         "on the relay (CLAUDE.md measurement rules)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_engine
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    engine = build_engine(args.model, window=args.window, stream=args.stream)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    params = engine.cast_head_params_bf16(params)
    params = jax.device_put(params, jax.devices()[0])

    H, W = 608, 1008
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    ish = np.array([600.0, 1000.0], np.float32)
    psh = np.array([608.0, 1008.0], np.float32)
    sf = jnp.asarray(np.array([1.67] * 4, np.float32))
    ishd = jnp.asarray(ish)
    branch = -1 if getattr(engine, "multi_branch", False) else None
    n = args.iters

    # every dispatch carries DISTINCT arguments (a numerically-invisible
    # perturbation chained through each iteration) so the loop exercises
    # buffer allocation like the real runner; note chained fresh-buffer
    # loops show a slow first window on this relay (allocator churn — see
    # BASELINE.md's measurement-methodology audit), which the best-of-3
    # interleaved windows below absorb.
    backbone = engine._frame_backbone_fn(H, W)
    chain = jax.jit(lambda im, c5: im + c5[0, 0, 0, 0].astype(jnp.float32)
                    * 1e-30)

    def bb_chained(p, im):
        c5, cm, rm = backbone(p, im)
        return chain(im, c5)

    def ab_chained(p, im):
        f = engine.frame_features(p, im, ish, psh)
        return chain(im, f["fc1"][None, None])

    feats = engine.frame_features(params, img, ish, psh)
    state = engine.ring_reset(int(feats["fc1"].shape[-1]))
    for _ in range(engine.window):
        state = engine.ring_push(state, feats, params=params)

    def ring(p, st, f):
        st, out = engine.ring_step(p, st, f, ishd, sf, branch=branch)
        return st, out

    # warm/compile every phase first
    o = bb_chained(params, img)
    jax.block_until_ready(o)
    o = ab_chained(params, img)
    jax.block_until_ready(o)
    st, out = ring(params, state, feats)
    jax.block_until_ready(out)

    # INTERLEAVED windows: tenancy on the shared tunnel swings several-fold
    # over minutes, so each repetition measures all three phases
    # back-to-back and the per-phase best is taken across repetitions —
    # relative comparisons stay tenancy-controlled
    t_a = t_ab = t_c = 1e9
    for _ in range(3):
        o = img
        t0 = time.perf_counter()
        for _ in range(n):
            o = bb_chained(params, o)
        jax.block_until_ready(o)
        t_a = min(t_a, (time.perf_counter() - t0) / n * 1e3)

        o = img
        t0 = time.perf_counter()
        for _ in range(n):
            o = ab_chained(params, o)
        jax.block_until_ready(o)
        t_ab = min(t_ab, (time.perf_counter() - t0) / n * 1e3)

        t0 = time.perf_counter()
        for _ in range(n):
            st, out = ring(params, st, feats)
        jax.block_until_ready(out)
        t_c = min(t_c, (time.perf_counter() - t0) / n * 1e3)

    if args.trace:
        with jax.profiler.trace(args.trace):
            o = img
            for _ in range(n):
                o = bb_chained(params, o)
            jax.block_until_ready(o)
            o = img
            for _ in range(n):
                o = ab_chained(params, o)
            jax.block_until_ready(o)
            for _ in range(n):
                st, out = ring(params, st, feats)
            jax.block_until_ready(out)
        import os
        import subprocess
        env = dict(os.environ,
                   PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
        subprocess.run([sys.executable,
                        osp.join(osp.dirname(osp.abspath(__file__)),
                                 "trace_report.py"), args.trace],
                       env=env, check=False)

    print(f"A backbone+RPN maps: {t_a:.2f} ms", flush=True)
    print(f"A+B frame_features:  {t_ab:.2f} ms  (B ≈ {t_ab - t_a:.2f})",
          flush=True)
    print(f"C ring_step:         {t_c:.2f} ms", flush=True)
    total = t_ab + t_c
    print(f"whole frame (A+B+C): {total:.2f} ms  ({1e3 / total:.1f} fps)",
          flush=True)


if __name__ == "__main__":
    main()
