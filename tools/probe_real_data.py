"""Attribute the real-data end-to-end gap: host pipeline vs H2D vs device.

Round-4 verdict weak #5: real-data e2e sits at 21.6-25.6 fps while the
device path runs 167-203 fps; the remaining lever was claimed to be H2D
double-buffering.  This probe splits the pipeline into measurable phases so
the fix (or a negative row) is attributed, not guessed:

  host      decode→resize→pad only, no jnp anywhere (pure-CPU ceiling —
            on a 1-core driver host this is the serial floor)
  h2d       host + device_put of every canvas (adds tunnel H2D)
  e2e       the full runner (host + H2D + device compute), u8 on/off,
            workers 1/4 — interleaved windows, best-of
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
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--host-only", action="store_true",
                    help="skip the device phases (no TPU needed)")
    args = ap.parse_args()

    from bench import REAL_DATA_PIPELINE, synth_video_dir
    from hvrnet_tpu.data import VIDSeqDataset
    import tempfile
    root = tempfile.mkdtemp(prefix="hvrnet_probe_vid_")
    ann_file = synth_video_dir(root, args.frames)

    def mkds():
        return VIDSeqDataset(ann_file=ann_file, img_prefix=root,
                             pipeline=REAL_DATA_PIPELINE, test_mode=True,
                             world_size=1)

    # ---- host-only: pipeline without any jax involvement
    from hvrnet_tpu.data.pipelines import Compose
    ds = mkds()
    pipe_u8 = Compose([dict(t) for t in ds.pipeline_cfg
                       if t["type"] != "Normalize"])
    infos = []
    for v in ds.img_infos:
        for off in range(v["frame_seg_len"]):
            finfo, _, _ = ds._frame_info(v, off, with_ann=False)
            infos.append(finfo)
    from hvrnet_tpu.engine.canvas import pad_to_canvas
    best_host = np.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for finfo in infos:
            r = dict(img_info=finfo)
            ds.pre_pipeline(r)
            out = pipe_u8(r)
            pad_to_canvas(out["img"], (608, 1008))
        best_host = min(best_host,
                        (time.perf_counter() - t0) / len(infos) * 1e3)
    report = dict(section="real_data_phases", frames=len(infos),
                  host_ms=round(best_host, 2),
                  host_fps=round(1e3 / best_host, 1))
    if args.host_only:
        print(json.dumps(report))
        return

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    # ---- host + H2D (u8 canvas)
    best_h2d = np.inf
    for _ in range(args.reps):
        arrs = []
        t0 = time.perf_counter()
        for finfo in infos:
            r = dict(img_info=finfo)
            ds.pre_pipeline(r)
            out = pipe_u8(r)
            arrs.append(jnp.asarray(
                pad_to_canvas(out["img"], (608, 1008))[None]))
        jax.block_until_ready(arrs[-1])
        best_h2d = min(best_h2d,
                       (time.perf_counter() - t0) / len(infos) * 1e3)
        del arrs
    report.update(h2d_ms=round(best_h2d, 2), h2d_fps=round(1e3 / best_h2d, 1))

    # ---- e2e through the runner, u8/workers grid, interleaved
    from bench import build_engine, run_real_data
    engine = build_engine("hvrnet", window=None, stream=True)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    params = engine.cast_head_params_bf16(params)
    params = jax.device_put(params, jax.devices()[0])
    grid = [(True, 4, 1), (True, 1, 1), (False, 4, 1),
            (True, 4, 4), (True, 4, 8)]
    e2e = {f"u8={u8},w={w},tb={tb}": 0.0 for u8, w, tb in grid}
    for _ in range(args.reps):
        for u8, w, tb in grid:
            fps = run_real_data(engine, params, args.frames, workers=w,
                                u8_transfer=u8, transfer_batch=tb)
            key = f"u8={u8},w={w},tb={tb}"
            e2e[key] = max(e2e[key], round(fps, 1))
    report.update(e2e_fps=e2e)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
