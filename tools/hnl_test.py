"""HVRNet distributed video-detection test CLI.

Counterpart of `/root/reference/tools/hnl_test.py` (804 LoC): the SELSA
sliding-window machine with a 63-frame feature cache (hnl_test.py:757,765)
driving the 4-block HRNMP head (t_dim 21, key_dim 10).  The reference
replaces start-of-video front padding with 31 random same-video pre-padding
frames (`pre_padding_imgs:293`); pass ``--pre-padding random`` for that
behaviour (default) or ``--pre-padding repeat`` for SELSA-style repetition.

Per-frame results keep the final-branch detections by default (see
HNMBRCNN engine docstring); ``--branch 0`` stores the NL2 branch instead.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="HVRNet VID test")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", default="results_hnl.pkl")
    p.add_argument("--world-size", type=int, default=1)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--tmpdir", default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--branch", type=int, default=-1)
    p.add_argument("--window", type=int, default=63,
                   help="feature-cache length (hnl_test.py:757)")
    p.add_argument("--pre-padding", choices=["random", "repeat"],
                   default="random")
    p.add_argument("--multi-pass", type=int, default=0, metavar="P",
                   help="split the window into P segments and run the head's "
                        "multi-pass test graph (forward_test_multi_passes, "
                        "hrnmp_bbox_head.py:911-967); 0 = spliced single-pass "
                        "graph (the default, forward_test:800-909)")
    p.add_argument("--pair-features", type=int, default=1, metavar="P",
                   help="batch P consecutive interior frames through one "
                        "feature program (identical outputs)")
    p.add_argument("--stream", action="store_true",
                   help="streaming-softmax ring (ops/streaming_attention.py):"
                        " slide updates NL1/NL3 accumulators incrementally "
                        "instead of recomputing the O(T²) window attention "
                        "per frame; bit-equal up to streaming-softmax "
                        "rounding (tests/test_streaming_engine.py)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--json_out", default=None,
                   help="COCO-results json file name WITHOUT extension "
                        "(reference hnl_test.py:669-678,770-800): rank 0 "
                        "writes <json_out>.bbox.json after the merge")
    p.add_argument("--show", action="store_true",
                   help="render detections onto the source frames "
                        "(reference hnl_test.py:686 displays interactively; "
                        "this environment is headless, so frames are written "
                        "to --show-dir instead)")
    p.add_argument("--show-dir", default="vis",
                   help="output directory for --show")
    p.add_argument("--show-thr", type=float, default=0.3,
                   help="score threshold for --show")
    return p.parse_args()


def main():
    import jax.numpy as jnp
    from hvrnet_tpu.apis import get_root_logger, load_params_for_engine
    from hvrnet_tpu.data import build_dataset
    from hvrnet_tpu.engine import SlidingWindowRunner
    from hvrnet_tpu.engine.stream import prefetch_stream, test_frame_stream
    from hvrnet_tpu.models.builder import build_detector
    from hvrnet_tpu.utils.config import Config
    from hvrnet_tpu.utils.dist_io import collect_results

    args = parse_args()
    cfg = Config.fromfile(args.config)
    logger = get_root_logger(rank=args.rank)

    # Window length and the head's t_dim are ONE derived quantity
    # (SURVEY §3.2: window = (2·frame_interval+1)·test_branches; the
    # reference's hardcoded 63-frame cache at hnl_test.py:757 is only
    # self-consistent with test_branches=3 ⇒ t_dim=63/key_dim=31).  When
    # --window differs from the config's t_dim, the head is rebuilt at the
    # consistent operating point instead of silently collapsing the cache.
    t_dim = int(cfg.test_cfg.bbox_head.t_dim)
    window = args.window
    if window != t_dim:
        logger.info("deriving head t_dim=%d, key_dim=%d from --window %d "
                    "(config had t_dim %d)", window, (window - 1) // 2,
                    window, t_dim)
        cfg.test_cfg["bbox_head"]["t_dim"] = window
        cfg.test_cfg["bbox_head"]["key_dim"] = (window - 1) // 2

    test_cfg_data = dict(cfg.data.test)
    test_cfg_data.update(dict(cfg.test_cfg.relation_setup))
    test_cfg_data.pop("frame_stride", None)
    dataset = build_dataset(test_cfg_data,
                            dict(test_mode=True, world_size=args.world_size))

    engine = build_detector(cfg.model, None, cfg.test_cfg,
                            dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    # the device ring buffer follows the requested cache length
    engine.window = window
    engine.key_dim = (window - 1) // 2
    if args.multi_pass:
        if window % args.multi_pass:
            raise SystemExit(f"--multi-pass {args.multi_pass} must divide "
                             f"the window length {window}")
        engine.multi_pass = args.multi_pass
    if args.stream:
        if args.multi_pass:
            raise SystemExit("--stream caches the single-pass spliced graph; "
                             "combine with --multi-pass is unsupported")
        engine.stream = True
    params = load_params_for_engine(engine, args.checkpoint)
    params = engine.cast_head_params_bf16(params)   # no-op unless --bf16

    prepad = None
    if args.pre_padding == "random":
        import jax.numpy as jnp_
        import numpy as np
        from hvrnet_tpu.engine.canvas import pad_to_canvas, pick_canvas_shape

        half = (window + 1) // 2
        # map each video's (rank-rebased) start frame id to its info: the
        # dataset's cur_video_index is a stateful eval-iterator variable and
        # the prefetch thread runs ahead of the runner, so the video must be
        # identified from the frame itself.  ONLY this rank's videos: frame
        # ids are rebased per rank (vid_dataset.get_indices), so ids collide
        # across ranks and a global map would return another rank's video.
        rank_videos = sorted(set(dataset.global_video_list[i]
                                 for i in dataset.indices_list[args.rank]))
        start2info = {int(dataset.img_infos[v]["frame_id"]):
                      dataset.img_infos[v] for v in rank_videos}

        def prepad(first_frame):
            """Fetch half−1 random same-video frames through the pipeline
            (hnl_test.py:pre_padding_imgs semantics)."""
            info = start2info[int(first_frame["frame_start_id"])]
            L = info["frame_seg_len"]
            outs = []
            for off in np.random.randint(0, L, size=half - 1):
                finfo, _, _ = dataset._frame_info(info, int(off),
                                                  with_ann=False)
                r = dict(img_info=finfo)
                dataset.pre_pipeline(r)
                out = dataset.pipeline(r)
                meta = out["img_meta"]
                ch, cw = pick_canvas_shape(meta["pad_shape"][0],
                                           meta["pad_shape"][1])
                outs.append(dict(
                    img=jnp_.asarray(pad_to_canvas(
                        out["img"].astype(np.float32), (ch, cw))[None]),
                    img_shape=np.asarray(meta["img_shape"][:2], np.float32),
                    pad_shape=np.asarray(meta["pad_shape"][:2], np.float32),
                    scale_factor=np.asarray(meta["scale_factor"], np.float32),
                    frame_offset=int(off), seg_len=L,
                    frame_start_id=info["frame_id"]))
            return outs

    runner = SlidingWindowRunner(engine, params, window=window,
                                 branch=args.branch, prepad_provider=prepad,
                                 pair_features=args.pair_features)
    results = runner.run(
        prefetch_stream(test_frame_stream(dataset, rank=args.rank)),
        num_frames=len(dataset))

    from hvrnet_tpu.utils.dist_io import (dump_part, trim_to_local,
                                          wait_for_parts)
    tmpdir = args.tmpdir or os.path.dirname(os.path.abspath(args.out)) or "."
    dump_part(trim_to_local(results, dataset, args.rank), tmpdir, args.rank)

    if args.rank == 0:
        parts = [os.path.join(tmpdir, f"part_{r}.pkl")
                 for r in range(args.world_size)]
        wait_for_parts(parts)
        merged = collect_results(tmpdir, args.world_size, len(dataset))
        with open(args.out, "wb") as f:
            pickle.dump(merged, f)
        logger.info("merged results → %s", args.out)
        if args.json_out:
            from tools.test import vid_results2json
            path = vid_results2json(dataset, merged,
                                    args.json_out + ".bbox.json")
            logger.info("COCO-json results → %s", path)
        if args.show:
            from tools.test import show_results
            n = show_results(dataset, merged, args.show_dir, args.show_thr)
            logger.info("wrote %d annotated frames → %s", n, args.show_dir)
        if args.eval:
            from tools.vid_eval import evaluate_results
            evaluate_results(args.out, args.config)


if __name__ == "__main__":
    main()
