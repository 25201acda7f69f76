"""Sweep Pallas flash-attention tile sizes at the HVRNet 63-frame operating
point (Nq = Nk = 63*300 = 18,900 tokens, d = 1024, bf16).

Round-3 perf item (VERDICT #1): the round-2 tiles (tq=256, tk=512) were tuned
at Nk≈6.3k; at 18.9k keys the kernel re-streams the full 77.6 MB K/V set
ceil(Nq/tq)=74 times per block (~5.7 GB HBM traffic/block), which is
memory-bound at ~7 ms vs a ~3.7 ms compute bound.  Larger q tiles divide the
K/V re-read count.

Usage: python tools/probe_attention_tiles.py [--nk 18900] [--nq 18900]
Timing: dispatch N, block once (tunnel rule — CLAUDE.md).

CAVEAT (round 3): absolute readings from this tool have been observed ABOVE
the chip's peak FLOP rate at small nq even with chained dispatches — treat
them as RELATIVE tile comparisons only and confirm winners with an xplane
trace of the real program (BASELINE.md, measurement-methodology audit).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=18900)
    ap.add_argument("--nk", type=int, default=18900)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--check", action="store_true",
                    help="verify vs the XLA reference (slow at 18.9k)")
    args = ap.parse_args()

    from hvrnet_tpu.ops.attention import _flash_attention, _attention_reference

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(args.nq, args.d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(args.nk, args.d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(args.nk, args.d)), jnp.bfloat16)
    bias = jnp.where(jnp.arange(args.nk) % 300 < 290, 0.0, -1e30)
    scale = 1.0 / float(np.sqrt(args.d))
    dev = jax.devices()[0]
    q, k, v, bias = jax.device_put((q, k, v, bias), dev)

    gflop = 2 * 2 * args.nq * args.nk * args.d / 1e9
    ref_out = None
    if args.check:
        print("computing XLA reference...", flush=True)
        ref_out = np.asarray(jax.jit(_attention_reference, static_argnums=4)(
            q, k, v, bias, scale))
        print("reference done", flush=True)

    tiles = [(256, 512), (512, 512), (512, 1024), (512, 1536), (512, 2048),
             (640, 1024), (768, 512), (768, 1024), (896, 512), (1024, 512),
             (1024, 1024)]
    results = []
    for tq, tk in tiles:
        print(f"compiling tq={tq} tk={tk}...", flush=True)
        try:
            # chain each call on the previous output: identical-argument
            # dispatches are NOT reliably serialized on the relay platform
            # (observed 70k "TFLOPS" with independent calls)
            def step(qq, k, v, b, _tq=tq, _tk=tk):
                out = _flash_attention(qq, k, v, b, scale, tq=_tq, tk=_tk)
                return (qq + out.astype(qq.dtype) * 1e-6), out

            f = jax.jit(step)
            qq, out = f(q, k, v, bias)
            jax.block_until_ready(out)
            if ref_out is not None:
                err = float(np.max(np.abs(np.asarray(out) - ref_out)))
            else:
                err = float("nan")
            # best-of-3 windows: chain iters dispatches, block once
            best = 1e9
            for _ in range(3):
                qq = q
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    qq, out = f(qq, k, v, bias)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            tflops = gflop / best / 1e3
            results.append((tq, tk, best * 1e3, tflops, err))
            print(f"tq={tq:5d} tk={tk:5d}  {best*1e3:7.3f} ms  "
                  f"{tflops:6.1f} TFLOPS  maxerr={err:.4g}", flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            print(f"tq={tq:5d} tk={tk:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    if results:
        tq, tk, ms, tf, _ = min(results, key=lambda r: r[2])
        print(f"BEST tq={tq} tk={tk}: {ms:.3f} ms ({tf:.1f} TFLOPS)")


if __name__ == "__main__":
    main()
