"""Training-time evaluation hook.

Counterpart of `/root/reference/mmdet/core/evaluation/eval_hooks.py:18-115`
(DistEvalHook: every rank runs its shard, dumps a tmp pickle, rank 0
barriers + merges + evaluates).  Here each rank evaluates its whole-video
shard with the sliding-window runner and writes an atomic part file; rank 0
waits for all parts (`wait_for_parts` — the filesystem rendezvous standing
in for dist.barrier, eval_hooks.py:56-60), concatenates them in rank order
(the dataset deals whole videos to ranks in order, so rank-block order IS
global frame order), and evaluates the merged results against the
world_size=1 ground truth.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


class VidEvalHook:
    def __init__(self, engine, dataset_cfg: dict, interval: int = 1,
                 work_dir: str = ".", world_size: int = 1, rank: int = 0,
                 window: Optional[int] = None, merge_timeout: float = 3600.0,
                 max_long: int = 1008, max_short: int = 608):
        self.engine = engine
        self.dataset_cfg = dict(dataset_cfg)
        self.interval = interval
        self.work_dir = work_dir
        self.world_size = world_size
        self.rank = rank
        self.window = window
        self.merge_timeout = merge_timeout
        self.max_long = max_long
        self.max_short = max_short

    def __call__(self, params, epoch: int) -> Optional[float]:
        if (epoch + 1) % self.interval:
            return None
        from ..core.evaluation import eval_map
        from ..data import VID_CLASSES, build_dataset
        from .stream import test_frame_stream
        from .video_runner import SlidingWindowRunner

        dataset = build_dataset(self.dataset_cfg,
                                dict(test_mode=True,
                                     world_size=self.world_size))
        runner = SlidingWindowRunner(self.engine, params, window=self.window)
        results = runner.run(
            test_frame_stream(dataset, rank=self.rank,
                              max_long=self.max_long,
                              max_short=self.max_short),
            num_frames=len(dataset))

        if self.world_size > 1:
            # persist this rank's shard (eval_hooks.py:52-55 tmp_file dump);
            # the runner fills the leading local_frame_size_list[rank] slots
            from ..utils.dist_io import (collect_results, dump_part,
                                         trim_to_local, wait_for_parts)
            tmpdir = os.path.join(self.work_dir, f"eval_tmp_ep{epoch}")
            dump_part(trim_to_local(results, dataset, self.rank),
                      tmpdir, self.rank)
            if self.rank != 0:
                return None
            wait_for_parts(
                [os.path.join(tmpdir, f"part_{r}.pkl")
                 for r in range(self.world_size)],
                timeout=self.merge_timeout)
            results = collect_results(tmpdir, self.world_size, len(dataset))
        elif self.rank != 0:
            return None

        # ground truth in GLOBAL frame order (world_size=1 build — the
        # sharded build rebases per-rank frame ids, eval_hooks.py:61-69)
        gt_dataset = build_dataset(self.dataset_cfg,
                                   dict(test_mode=True, world_size=1))
        gt_bboxes, gt_labels = [], []
        for i in range(len(gt_dataset)):
            ann = gt_dataset.get_ann_info(i)
            gt_bboxes.append(ann["bboxes"])
            gt_labels.append(ann["labels"])
        empty = [np.zeros((0, 5), np.float32)
                 for _ in range(self.engine.num_classes - 1)]
        results = [r if r is not None else empty for r in results]
        mean_ap, _ = eval_map(results, gt_bboxes, gt_labels,
                              dataset=VID_CLASSES, print_summary=True)
        with open(os.path.join(self.work_dir, "train_log.jsonl"), "a") as f:
            f.write(json.dumps(dict(epoch=epoch, mAP=float(mean_ap))) + "\n")
        return float(mean_ap)
