"""Benchmark: HVRNet / SELSA video-detection inference throughput per chip.

Measures the steady-state cost of one output frame at the reference operating
points:

* ``hvrnet`` (default — BASELINE.json's north-star metric): the
  `tools/hnl_test.py` machine at the committed config's t_dim=21/key_dim=10
  point (`/root/reference/tools/hnl_test.py:757`,
  `configs/faster_rcnn_r101_hrnmp_c5.py:151-152`): (1000, 600) keep-ratio
  input on the 608×1008 canvas, R101-C4 + dilated-C5 shared head, 6000→300
  proposal RPN, RoIAlign 7×7, 4-block HRNMP relation head over 21×300 = 6300
  tokens, final-branch multiclass NMS.
* ``selsa``: the `tools/test.py` machine (21-frame window, 2-block head).

Per output frame the pipeline runs exactly one frame_features call
(backbone+RPN+RoIAlign+fc1, cached per frame) and one fused ring_step
(window push + relation head + decode) — the TPU-first restructuring of the
reference loop, which recomputes shared-head, RPN and RoIAlign over all T
cached frames for every output frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to the 4 fps/GPU reference-implementation proxy
derived in BASELINE.md §proxy-baseline (no fps is published in the
reference repo).

Compute is bf16 with a recorded accuracy budget (tests/test_bf16_budget.py,
BASELINE.md): trained-model f32→bf16 end-to-end delta is ΔmAP 0.000 /
0.099 px max box drift on the full test path.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 4.0  # documented proxy (BASELINE.md): reference impl. per GPU


def build_engine(model: str, window=None, stream: bool = False):
    """window: override the cache length; the head's t_dim/key_dim derive
    from it BEFORE the module is built (window ↔ t_dim are one quantity —
    mutating only engine.window would attend just the first t_dim frames of
    the ring, a semantically wrong, cheaper graph).

    stream: carry streaming-softmax accumulators in the ring (HVRNet only;
    ops/streaming_attention.py) — each slide updates NL1/NL3 incrementally
    in O(T·P²·D) instead of recomputing the O(T²·P²·D) window attention.
    Equality-tested vs the exact ring path (tests/test_streaming_engine.py).
    """
    import jax.numpy as jnp
    from hvrnet_tpu.utils.config import Config
    if model == "hvrnet":
        from hvrnet_tpu.engine import HNMBRCNN
        cfg = Config.fromfile("configs/faster_rcnn_r101_hrnmp_c5.py")
        cls = HNMBRCNN
    else:
        from hvrnet_tpu.engine import SelsaRCNN
        cfg = Config.fromfile("configs/faster_rcnn_r101_selsa_c5.py")
        cls = SelsaRCNN
    if window:
        cfg.test_cfg["bbox_head"]["t_dim"] = int(window)
        cfg.test_cfg["bbox_head"]["key_dim"] = (int(window) - 1) // 2
    engine = cls(cfg.model, None, cfg.test_cfg, dtype=jnp.bfloat16)
    if window:
        engine.window = int(window)
        engine.key_dim = (int(window) - 1) // 2
    if stream:
        if model != "hvrnet":
            raise SystemExit("--stream is an HVRNet ring feature")
        engine.stream = True
        # production default (SlidingWindowRunner does the same): the
        # speculative-rollback step — health flag in state instead of the
        # exact-repair lax.cond (the cond costs ~0.28 ms/step at T=21 as a
        # fusion barrier even when never taken; the runner replays flagged
        # chunks exactly on the host).  --cond-repair measures the old path.
        engine.stream_rollback = True
    return engine


REAL_DATA_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(1000, 600), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0),
    dict(type="Normalize", mean=[103.06, 115.90, 123.15],
         std=[1.0, 1.0, 1.0], to_rgb=False),
    dict(type="Pad", size_divisor=16),
    dict(type="Collect", keys=["img"]),
]


def synth_video_dir(root: str, n_frames: int, src_h: int = 540,
                    src_w: int = 960) -> str:
    """Write one synthetic video (JPEG frames + minimal VOC XML + imageset)
    so the REAL host path runs: JPEG decode → resize → normalize → pad.
    Noise frames are the worst case for the JPEG decoder (no entropy win)."""
    import os
    import xml.etree.ElementTree as ET
    import cv2
    vpath = "val/BENCH_val_00000000"
    jdir = os.path.join(root, "JPEGImages", vpath)
    adir = os.path.join(root, "Annotations", vpath)
    os.makedirs(jdir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        img = rng.integers(0, 255, (src_h, src_w, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(jdir, f"{i:06d}.JPEG"), img)
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        ET.SubElement(size, "width").text = str(src_w)
        ET.SubElement(size, "height").text = str(src_h)
        ET.ElementTree(ann).write(os.path.join(adir, f"{i:06d}.xml"))
    iset = os.path.join(root, "ImageSets")
    os.makedirs(iset, exist_ok=True)
    ann_file = os.path.join(iset, "VID_val_videos.txt")
    with open(ann_file, "w") as f:
        f.write(f"{vpath} 1 0 {n_frames}\n")
    return ann_file


def run_real_data(engine, params, n_frames: int, workers: int = 4,
                  u8_transfer: bool = True, transfer_batch: int = 1):
    """End-to-end fps on on-disk JPEG video through the full host pipeline +
    parallel loader + SlidingWindowRunner (VERDICT weak #5: the device-only
    bench never measured decode/prefetch overlap)."""
    import tempfile
    from hvrnet_tpu.data import VIDSeqDataset
    from hvrnet_tpu.engine import SlidingWindowRunner
    from hvrnet_tpu.engine.stream import parallel_test_frame_stream

    root = tempfile.mkdtemp(prefix="hvrnet_bench_vid_")
    ann_file = synth_video_dir(root, n_frames)
    norm = next(t for t in REAL_DATA_PIPELINE if t["type"] == "Normalize")
    engine.img_norm = dict(mean=tuple(norm["mean"]), std=tuple(norm["std"]))

    def mkds():
        return VIDSeqDataset(ann_file=ann_file, img_prefix=root,
                             pipeline=REAL_DATA_PIPELINE, test_mode=True,
                             world_size=1)

    runner = SlidingWindowRunner(engine, params, branch=-1)
    # pass 1 compiles every program; pass 2 is the steady-state measurement
    ds = mkds()
    runner.run(parallel_test_frame_stream(ds, rank=0, workers=workers,
                                          u8_transfer=u8_transfer,
                                          transfer_batch=transfer_batch),
               num_frames=len(ds))
    ds2 = mkds()
    t0 = time.perf_counter()
    runner.run(parallel_test_frame_stream(ds2, rank=0, workers=workers,
                                          u8_transfer=u8_transfer,
                                          transfer_batch=transfer_batch),
               num_frames=len(ds2))
    return len(ds2) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["hvrnet", "selsa"], default="hvrnet")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--window", type=int, default=None,
                    help="override the cache length (e.g. 63 for the "
                         "3-branch HVRNet point)")
    ap.add_argument("--real-data", action="store_true",
                    help="measure end-to-end on an on-disk JPEG video "
                         "(host decode + pipeline + prefetch + runner) "
                         "instead of the device-path synthetic frame")
    ap.add_argument("--transfer-batch", type=int, default=1,
                    help="--real-data: group B consecutive frames into one "
                         "H2D transfer (amortizes the tunnel's per-transfer "
                         "round trip; numerically identical)")
    ap.add_argument("--stream", action="store_true", default=None,
                    help="streaming-softmax ring (the hvrnet default: "
                         "equality-tested vs the exact ring and faster at "
                         "every window — 113 vs 43 fps at the 63-frame "
                         "point, round 3; --exact forces the full-window "
                         "recompute)")
    ap.add_argument("--exact", dest="stream", action="store_false")
    ap.add_argument("--cond-repair", action="store_true",
                    help="streaming with the in-program exact-repair "
                         "lax.cond instead of the speculative-rollback "
                         "health flag (the pre-round-4 path; for A/B)")
    ap.add_argument("--bind", action="store_true",
                    help="closure-bind params into the per-frame programs "
                         "(equality-tested; interleaved A/B on this relay: "
                         "+0.01 ms/frame — the per-call dispatch saving is "
                         "hidden by async pipelining — for extra XLA "
                         "compiles, so off by default; for hosts where "
                         "dispatch is exposed)")
    ap.add_argument("--fused", action="store_true", default=None,
                    help="2-dispatch frame structure: backbone | fused "
                         "post+window stage (engine.ring_step_fused) instead "
                         "of backbone | post | ring_step "
                         "(equality-tested, tests/test_fused_poststep.py). "
                         "Default: on at --window >= 35, where the "
                         "interleaved A/B wins (8.01 -> 7.71 ms/frame at "
                         "T=63); a tie at T=21 (4.42 vs 4.49), so the "
                         "headline keeps the split structure")
    ap.add_argument("--no-fused", dest="fused", action="store_false")
    ap.add_argument("--windows", type=int, default=6,
                    help="number of measurement windows; the reported fps is "
                         "the best window (steady-state estimator under "
                         "tenancy noise, BASELINE.md methodology audit)")
    ap.add_argument("--spread", type=float, default=6.0,
                    help="seconds to sleep between measurement windows. "
                         "Tenancy on the shared tunnel swings several-fold "
                         "over MINUTES, so back-to-back windows (~0.5 s "
                         "total) sample a single tenancy slice; spreading "
                         "the windows over ~30 s gives the best-of a chance "
                         "to catch a quiet slice. 0 restores back-to-back")
    ap.add_argument("--pair", type=int, default=1, metavar="P",
                    help="batch P consecutive frames through one feature "
                         "program (the SlidingWindowRunner pair_features "
                         "mode — identical outputs, equality-tested). "
                         "SLOWER on v5e (interleaved A/B: 8.8 vs 4.9 "
                         "ms/frame at P=2 — the batched post unrolls per "
                         "lane); provided for hardware where conv batching "
                         "pays")
    args = ap.parse_args()
    if args.stream is None:
        args.stream = args.model == "hvrnet"

    import os
    import jax
    import jax.numpy as jnp
    os.makedirs("/tmp/hvrnet_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hvrnet_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    engine = build_engine(args.model, window=args.window,
                          stream=bool(args.stream))
    if args.fused is None:
        # resolved against the built engine's window: the fused post+step
        # saves a dispatch and the fc1 HBM round trip, which pays once the
        # window stage dominates (T=63 A/B: 124.9 -> 129.8 fps,
        # tools/probe_fused_step.py) and is noise at the T=21 headline
        args.fused = (args.model == "hvrnet" and engine.window >= 35
                      and not args.real_data and args.pair == 1)
    if args.cond_repair:
        if not args.stream:
            raise SystemExit("--cond-repair applies to the streaming ring")
        engine.stream_rollback = False
    # parameter init runs on the host CPU backend (hundreds of tiny programs
    # are slow over the device tunnel), then transfers once.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = engine.init_params(jax.random.PRNGKey(0))
    # bit-identical bf16 copies of the head kernels (the bf16 apply path
    # would cast them per call; fc_new_1 alone is 205 MB f32)
    params = engine.cast_head_params_bf16(params)
    params = jax.device_put(params, jax.devices()[0])
    if args.bind:
        # closure-bind params into the per-frame programs: drops the
        # param-tree dispatch argument (equality-tested,
        # tests/test_bind_params.py; see --bind help for the trade-off)
        engine.bind_params(params)

    if args.real_data:
        fps = run_real_data(engine, params, args.frames,
                            transfer_batch=args.transfer_batch)
        name = (f"{args.model}_r101_vid_e2e_throughput")
        print(json.dumps({
            "metric": name,
            "value": round(fps, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
        }))
        return

    H, W = 608, 1008
    T = engine.window
    rng = np.random.default_rng(0)
    # UNIQUE frames: real video feeds a distinct buffer every frame, so the
    # bench does too — a device-side counter mixed into a rotating base set
    # (+c·1e-30, numerically invisible) rather than per-frame H2D uploads.
    # (A suspicion that the relay dedupes identical-argument dispatches was
    # tested and rejected — see BASELINE.md's measurement-methodology audit —
    # but unique frames also exercise the allocator exactly like the real
    # runner, which single-buffer loops do not.)
    imgs = [jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
            for _ in range(8)]
    img = imgs[0]

    @jax.jit
    def next_frame(base, c):
        return base + c * 1e-30, c + 1.0

    frame_counter = jnp.float32(0.0)
    img_shape = np.array([600.0, 1000.0], np.float32)
    pad_shape = np.array([608.0, 1008.0], np.float32)
    scale_factor = np.array([1.67, 1.67, 1.67, 1.67], np.float32)
    # multi-branch heads decode only the stored (final) branch on device,
    # exactly what the runner keeps for mAP
    branch = -1 if getattr(engine, "multi_branch", False) else None

    # warm up / compile (device-resident ring buffer, one push + one detect
    # dispatch per frame — the real runner's steady state)
    ish = jnp.asarray(img_shape)
    sfd = jnp.asarray(scale_factor)
    feats = engine.frame_features(params, img, img_shape, pad_shape)
    jax.block_until_ready(feats)
    state = engine.ring_reset(int(feats["fc1"].shape[-1]))
    for _ in range(T):
        state = engine.ring_push(state, feats, params=params)
    state, out = engine.ring_step(params, state, feats, ish, sfd,
                                  branch=branch)
    jax.block_until_ready(out)
    psh = jnp.asarray(pad_shape)
    if args.fused:
        if args.pair > 1:
            raise SystemExit("--fused applies to the sequential loop")
        c5, cm, rm = engine._backbone_dispatch(params, img, img_shape)
        state, out = engine.ring_step_fused(params, state, c5, cm, rm,
                                            ish, psh, sfd, branch=branch)
        jax.block_until_ready(out)

    # best of N windows SPREAD over wall time: the shared dev tunnel shows
    # several-fold tenancy swings on a minutes timescale (BASELINE.md
    # variance note), so back-to-back windows all sample the same tenancy
    # slice; sleeping --spread seconds between windows lets the max over
    # windows estimate the chip's actual steady-state throughput
    P = max(args.pair, 1)
    if P > 1:
        imgs_p = [jnp.concatenate([imgs[(i + j) % len(imgs)]
                                   for j in range(P)], axis=0)
                  for i in range(len(imgs))]
        ish_p = np.tile(img_shape, (P, 1))
        psh_p = np.tile(pad_shape, (P, 1))
        fb = engine.frame_features_batched(params, imgs_p[0], ish_p, psh_p)
        jax.block_until_ready(fb["fc1"])

    n = max(args.frames // 3, 20)
    n = max(n - n % P, P)          # never round the window down to zero
    fps = 0.0
    for w in range(max(args.windows, 1)):
        if w and args.spread > 0:
            time.sleep(args.spread)
        t0 = time.perf_counter()
        if P > 1:
            for i in range(n // P):
                frame, frame_counter = next_frame(imgs_p[i % len(imgs_p)],
                                                  frame_counter)
                fb = engine.frame_features_batched(params, frame,
                                                   ish_p, psh_p)
                for j in range(P):
                    feats = {k: v[j] for k, v in fb.items()}
                    state, out = engine.ring_step(params, state, feats, ish,
                                                  sfd, branch=branch)
        elif args.fused:
            for i in range(n):
                frame, frame_counter = next_frame(imgs[i % len(imgs)],
                                                  frame_counter)
                c5, cm, rm = engine._backbone_dispatch(params, frame,
                                                       img_shape)
                state, out = engine.ring_step_fused(
                    params, state, c5, cm, rm, ish, psh, sfd, branch=branch)
        else:
            for i in range(n):
                frame, frame_counter = next_frame(imgs[i % len(imgs)],
                                                  frame_counter)
                feats = engine.frame_features(params, frame,
                                              img_shape, pad_shape)
                state, out = engine.ring_step(params, state, feats, ish, sfd,
                                              branch=branch)
        jax.block_until_ready(out)
        fps = max(fps, n / (time.perf_counter() - t0))

    name = ("hvrnet_r101_vid_inference_throughput" if args.model == "hvrnet"
            else "selsa_r101_vid_inference_throughput")
    print(json.dumps({
        "metric": name,
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
