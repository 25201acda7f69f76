"""VID mAP evaluation CLI (counterpart of `/root/reference/tools/vid_eval.py`).

Loads a results pickle, pulls per-frame GT through the dataset's stateful
sequential iterator, and runs `eval_map` with the 30 VID class names.  Also
exposes `--analysis` for the confusion-analysis variant (`analysis_map`).

Note: like the reference (vid_eval.py:35-53), passing the class-name tuple as
``dataset`` selects fixed-threshold `tpfp_default` matching; pass
``--imagenet-tpfp`` to use the adaptive `tpfp_imagenet` rule instead.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_results(result_file: str, config_file: str, iou_thr: float = 0.5,
                     analysis: bool = False, imagenet_tpfp: bool = False,
                     quiet: bool = False):
    from hvrnet_tpu.core.evaluation import analysis_map, eval_map
    from hvrnet_tpu.data import VID_CLASSES, build_dataset
    from hvrnet_tpu.utils.config import Config

    cfg = Config.fromfile(config_file)
    dataset = build_dataset(dict(cfg.data.test), dict(test_mode=True,
                                                      world_size=1))
    with open(result_file, "rb") as f:
        det_results = pickle.load(f)
    # HVRNet runs may store [branch, final] pairs; keep the final branch
    if det_results and isinstance(det_results[0], list) \
            and len(det_results[0]) == 2 \
            and isinstance(det_results[0][0], list):
        det_results = [r[1] if r is not None else None for r in det_results]
    n_missing = sum(r is None for r in det_results)
    if n_missing:
        print(f"warning: {n_missing} frames without results → empty dets")
        empty = [np.zeros((0, 5), np.float32) for _ in range(30)]
        det_results = [r if r is not None else empty for r in det_results]

    gt_bboxes, gt_labels = [], []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        gt_bboxes.append(ann["bboxes"])
        gt_labels.append(ann["labels"])

    ds_name = "vid" if imagenet_tpfp else VID_CLASSES
    if analysis:
        return analysis_map(det_results, gt_bboxes, gt_labels, iou_thr=iou_thr,
                            dataset=VID_CLASSES, file_dir=".",
                            print_summary=not quiet)
    return eval_map(det_results, gt_bboxes, gt_labels, iou_thr=iou_thr,
                    dataset=ds_name, print_summary=not quiet)


def main():
    parser = argparse.ArgumentParser(description="VID mAP evaluation")
    parser.add_argument("result")
    parser.add_argument("config")
    parser.add_argument("--iou-thr", type=float, default=0.5)
    parser.add_argument("--analysis", action="store_true")
    parser.add_argument("--imagenet-tpfp", action="store_true")
    args = parser.parse_args()
    evaluate_results(args.result, args.config, args.iou_thr, args.analysis,
                     args.imagenet_tpfp)


if __name__ == "__main__":
    main()
