"""VOC mAP evaluation (counterpart of `/root/reference/tools/voc_eval.py`)."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def voc_eval(result_file, dataset, iou_thr=0.5):
    from hvrnet_tpu.core.evaluation import eval_map
    with open(result_file, "rb") as f:
        det_results = pickle.load(f)
    gt_bboxes, gt_labels, gt_ignore = [], [], []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        import numpy as np
        bboxes, labels = ann["bboxes"], ann["labels"]
        if ann.get("bboxes_ignore") is not None and len(ann["bboxes_ignore"]):
            ignore = np.concatenate([
                np.zeros(bboxes.shape[0], bool),
                np.ones(ann["bboxes_ignore"].shape[0], bool)])
            gt_ignore.append(ignore)
            bboxes = np.vstack([bboxes, ann["bboxes_ignore"]])
            labels = np.concatenate([labels, ann["labels_ignore"]])
        gt_bboxes.append(bboxes)
        gt_labels.append(labels)
    if not gt_ignore:
        gt_ignore = None
    dataset_name = ("voc07" if getattr(dataset, "year", None) == 2007
                    else dataset.CLASSES)
    return eval_map(det_results, gt_bboxes, gt_labels, gt_ignore=gt_ignore,
                    iou_thr=iou_thr, dataset=dataset_name, print_summary=True)


def main():
    from hvrnet_tpu.data import build_dataset
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser(description="VOC evaluation")
    p.add_argument("result")
    p.add_argument("config")
    p.add_argument("--iou-thr", type=float, default=0.5)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data.test), dict(test_mode=True))
    voc_eval(args.result, dataset, args.iou_thr)


if __name__ == "__main__":
    main()
