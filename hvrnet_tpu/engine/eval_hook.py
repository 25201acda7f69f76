"""Training-time evaluation hook.

Counterpart of `/root/reference/mmdet/core/evaluation/eval_hooks.py`
(DistEvalHook / DistEvalmAPHook: round-robin frames over ranks, tmp-pkl
merge, mAP into the log buffer at epoch end).  Here each host evaluates its
whole-video shard with the sliding-window runner and rank 0 aggregates + logs
mAP into the trainer's JSONL log.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


class VidEvalHook:
    def __init__(self, engine, dataset_cfg: dict, interval: int = 1,
                 work_dir: str = ".", world_size: int = 1, rank: int = 0,
                 window: Optional[int] = None):
        self.engine = engine
        self.dataset_cfg = dict(dataset_cfg)
        self.interval = interval
        self.work_dir = work_dir
        self.world_size = world_size
        self.rank = rank
        self.window = window

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
        results = runner.run(test_frame_stream(dataset, rank=self.rank),
                             num_frames=len(dataset))
        if self.rank != 0:
            return None
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
