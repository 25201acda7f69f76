"""SELSA distributed video-detection test CLI.

Counterpart of `/root/reference/tools/test.py` (803 LoC): sliding-window
inference with a 21-frame cache, whole-video sharding across ranks, results
placed by absolute frame id and merged from per-rank part files
(collect_selsa_results_cpu:546-589 → part pickles here).  Window bookkeeping
lives in `hvrnet_tpu.engine.video_runner`; this file is argument parsing +
result collection.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="SELSA VID test")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", default="results.pkl")
    p.add_argument("--world-size", type=int, default=1,
                   help="number of video shards (ranks)")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--tmpdir", default=None,
                   help="directory for per-rank part files")
    p.add_argument("--eval", action="store_true", help="run vid mAP at the end")
    p.add_argument("--json_out", default=None,
                   help="COCO-results json file name WITHOUT extension "
                        "(reference test.py:675-678,791-799): rank 0 writes "
                        "<json_out>.bbox.json after the merge")
    p.add_argument("--show", action="store_true",
                   help="render detections onto the source frames "
                        "(reference test.py:685 displays interactively; this "
                        "environment is headless, so frames are written to "
                        "--show-dir instead)")
    p.add_argument("--show-dir", default="vis",
                   help="output directory for --show")
    p.add_argument("--show-thr", type=float, default=0.3,
                   help="score threshold for --show")
    p.add_argument("--merge-timeout", type=float, default=3600.0,
                   help="rank-0 wait (s) for other ranks' part files")
    p.add_argument("--branch", type=int, default=-1,
                   help="which head branch to keep (HVRNet)")
    p.add_argument("--window", type=int, default=None,
                   help="override sliding-window length")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--aug-test", action="store_true",
                   help="flip-augmented testing (MultiScaleFlipAug flip=True"
                        " semantics: per-frame proposal merge + per-aug score"
                        " averaging)")
    p.add_argument("--loader-workers", type=int, default=1,
                   help=">1 decodes frames with an order-preserving thread "
                        "pool (same distribution, different shuffle RNG "
                        "stream than the sequential iterator)")
    p.add_argument("--u8-transfer", action="store_true",
                   help="ship frames host→device as uint8 and normalize on "
                        "device (4× less transfer; arithmetic-identical "
                        "because the pipeline resizes in uint8)")
    p.add_argument("--pair-features", type=int, default=1, metavar="P",
                   help="batch P consecutive interior frames through one "
                        "feature program (same detections up to conv-batch "
                        "reduction-order drift, equality-tested). Measured "
                        "SLOWER on v5e (8.8 vs 4.9 ms/frame at P=2); for "
                        "hardware where conv batching pays")
    p.add_argument("--batched", type=int, default=0, metavar="B",
                   help="drive B video streams in lockstep through the "
                        "batched ring-buffer runner (throughput mode for the "
                        "full val sweep; schedule-exact vs sequential)")
    p.add_argument("--spmd-lanes", action="store_true",
                   help="with --batched B: shard the B lockstep streams over "
                        "all local devices in ONE program (B must divide by "
                        "the device count; single-process multi-chip "
                        "scale-out — vs --world-size's process-per-rank + "
                        "part-file merge)")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace to this directory")
    p.add_argument("--timing", action="store_true",
                   help="print per-phase wall-clock summary at the end")
    return p.parse_args()


from hvrnet_tpu.utils.dist_io import (collect_results, dump_part,  # noqa: E402
                                      trim_to_local, wait_for_parts)


def main():
    import jax.numpy as jnp
    from hvrnet_tpu.apis import get_root_logger, load_params_for_engine
    from hvrnet_tpu.data import build_dataset
    from hvrnet_tpu.engine import SlidingWindowRunner
    from hvrnet_tpu.engine.stream import prefetch_stream, test_frame_stream
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.config import Config

    args = parse_args()
    cfg = Config.fromfile(args.config)
    logger = get_root_logger(rank=args.rank)

    test_cfg_data = dict(cfg.data.test)
    test_cfg_data.update(dict(cfg.test_cfg.relation_setup))
    test_cfg_data.pop("frame_stride", None)
    dataset = build_dataset(test_cfg_data,
                            dict(test_mode=True, world_size=args.world_size))

    engine = build_detector(cfg.model, None, cfg.test_cfg,
                            dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.u8_transfer:
        # the device-side normalize must use THIS config's img_norm values
        norm = next((t for t in cfg.data.test["pipeline"]
                     if t["type"] == "Normalize"), None)
        if norm is not None:
            if norm.get("to_rgb", False):
                raise SystemExit("--u8-transfer supports to_rgb=False "
                                 "pipelines only (BGR, like both shipped "
                                 "configs)")
            engine.img_norm = dict(mean=tuple(norm["mean"]),
                                   std=tuple(norm["std"]))
    params = load_params_for_engine(engine, args.checkpoint)
    params = engine.cast_head_params_bf16(params)   # no-op unless --bf16

    done = [0]

    def progress(k):
        done[0] += k
        if done[0] % 100 == 0:
            logger.info("rank %d: %d frames done", args.rank, done[0])

    from hvrnet_tpu.utils.profiling import PhaseTimer, trace
    import contextlib
    timer = PhaseTimer() if args.timing else None
    trace_ctx = trace(args.trace) if args.trace else contextlib.nullcontext()
    if args.spmd_lanes and not args.batched:
        raise SystemExit("--spmd-lanes requires --batched B (the lanes are "
                         "the batched runner's streams)")
    if args.batched:
        if args.aug_test:
            raise SystemExit("--batched and --aug-test are exclusive")
        if args.timing:
            raise SystemExit("--timing is not supported with --batched "
                             "(the lockstep runner has no per-phase timer)")
        from hvrnet_tpu.engine.batched_runner import BatchedSlidingWindowRunner
        if args.window:   # the batched ring buffers follow engine.window
            engine.window = args.window
            engine.key_dim = (args.window - 1) // 2
        if args.pair_features > 1:
            raise SystemExit("--pair-features applies to the sequential "
                             "runner; --batched already batches the feature "
                             "stage across streams")
        if args.spmd_lanes:
            import jax
            from hvrnet_tpu.parallel.mesh import make_mesh
            n_dev = len(jax.devices())
            if args.batched % n_dev:
                raise SystemExit(f"--spmd-lanes needs --batched divisible by "
                                 f"the device count ({n_dev})")
            engine.enable_spmd_lanes(make_mesh(n_dev))
            logger.info("SPMD lanes: %d streams over %d devices",
                        args.batched, n_dev)
        runner = BatchedSlidingWindowRunner(
            engine, params, batch=args.batched, window=args.window,
            branch=args.branch, progress_hook=progress,
            loader_workers=max(args.loader_workers, 0),
            u8_transfer=args.u8_transfer)
        with trace_ctx:
            results = runner.run(dataset, rank=args.rank)
    else:
        runner = SlidingWindowRunner(engine, params, window=args.window,
                                     branch=args.branch,
                                     progress_hook=progress,
                                     timer=timer, aug=args.aug_test,
                                     pair_features=args.pair_features)
        if (args.loader_workers > 1 or args.u8_transfer) and not args.aug_test:
            from hvrnet_tpu.engine.stream import parallel_test_frame_stream
            stream = parallel_test_frame_stream(
                dataset, rank=args.rank, workers=max(args.loader_workers, 1),
                u8_transfer=args.u8_transfer)
        else:
            if args.u8_transfer:
                raise SystemExit("--u8-transfer is not supported with "
                                 "--aug-test")
            stream = prefetch_stream(test_frame_stream(
                dataset, rank=args.rank, aug_flip=args.aug_test))
        with trace_ctx:
            results = runner.run(stream, num_frames=len(dataset))
    if timer is not None:
        print(timer.summary())

    tmpdir = args.tmpdir or os.path.dirname(os.path.abspath(args.out)) or "."
    dump_part(trim_to_local(results, dataset, args.rank), tmpdir, args.rank)
    logger.info("rank %d wrote part file", args.rank)

    if args.rank == 0:
        parts = [os.path.join(tmpdir, f"part_{r}.pkl")
                 for r in range(args.world_size)]
        wait_for_parts(parts, timeout=args.merge_timeout)
        merged = collect_results(tmpdir, args.world_size, len(dataset))
        with open(args.out, "wb") as f:
            pickle.dump(merged, f)
        logger.info("merged results → %s", args.out)
        if args.json_out:
            path = vid_results2json(dataset, merged, args.json_out + ".bbox.json")
            logger.info("COCO-json results → %s", path)
        if args.show:
            n = show_results(dataset, merged, args.show_dir, args.show_thr)
            logger.info("wrote %d annotated frames → %s", n, args.show_dir)
        if args.eval:
            from tools.vid_eval import evaluate_results
            evaluate_results(args.out, args.config)


def _iter_frames(dataset):
    """(global frame index, video info, in-video offset) over dataset order."""
    fid = 0
    for vinfo in dataset.img_infos:
        for off in range(vinfo["frame_seg_len"]):
            yield fid, vinfo, off
            fid += 1


def vid_results2json(dataset, results, out_file):
    """Merged per-frame results → COCO results json.

    Frame-aware variant of `tools/coco_eval.results2json` (reference
    `coco_utils.py` det2json semantics: xywh with the +1 VOC width
    convention, category_id = label + 1): the VID dataset's image ids are
    the per-frame `pattern % offset` strings.
    """
    import json
    json_results = []
    for fid, vinfo, off in _iter_frames(dataset):
        if fid >= len(results) or results[fid] is None:
            continue
        res = results[fid]
        if isinstance(res, list) and len(res) == 2 and isinstance(res[0], list):
            res = res[1]      # (proposals, dets) pairs from some runners
        for label, dets in enumerate(res):
            for det in dets:
                x1, y1, x2, y2, score = [float(v) for v in det[:5]]
                json_results.append(dict(
                    image_id=vinfo["pattern"] % off,
                    bbox=[x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                    score=score, category_id=label + 1))
    with open(out_file, "w") as f:
        json.dump(json_results, f)
    return out_file


def show_results(dataset, results, out_dir, score_thr):
    """Draw detections on the source frames (headless `--show`)."""
    import cv2
    from inference_vis import draw_result   # repo root is on sys.path
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fid, vinfo, off in _iter_frames(dataset):
        if fid >= len(results) or results[fid] is None:
            continue
        path = os.path.join(dataset.img_prefix, "JPEGImages",
                            (vinfo["pattern"] % off) + ".JPEG")
        img = cv2.imread(path)
        if img is None:
            continue
        res = results[fid]
        if isinstance(res, list) and len(res) == 2 and isinstance(res[0], list):
            res = res[1]
        draw_result(img, res, score_thr=score_thr)
        cv2.imwrite(os.path.join(out_dir, f"{fid:06d}.jpg"), img)
        n += 1
    return n


if __name__ == "__main__":
    main()
