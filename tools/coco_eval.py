"""COCO-protocol evaluation (counterpart of `/root/reference/tools/coco_eval.py`
and `mmdet/core/evaluation/coco_utils.py` results2json).

Without pycocotools in this image, AP is computed with the in-repo
`eval_map` over IoU 0.5:0.95 — the standard COCO averaging — plus a
results2json converter for interchange with external cocoapi tooling.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def results2json(dataset, results, out_file):
    """Per-class det lists → COCO results json (coco_utils.py semantics)."""
    json_results = []
    cat_ids = getattr(dataset, "cat_ids",
                      list(range(1, len(dataset.CLASSES) + 1)))
    for idx in range(len(results)):
        img_id = dataset.img_infos[idx]["id"]
        res = results[idx]
        if res is None:
            continue
        for label, dets in enumerate(res):
            for det in dets:
                x1, y1, x2, y2, score = det[:5].tolist()
                json_results.append(dict(
                    image_id=img_id,
                    bbox=[x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                    score=float(score),
                    category_id=cat_ids[label]))
    with open(out_file, "w") as f:
        json.dump(json_results, f)
    return out_file


def coco_style_eval(det_results, gt_bboxes, gt_labels, classes):
    from hvrnet_tpu.core.evaluation import eval_map
    aps = []
    for thr in np.arange(0.5, 1.0, 0.05):
        m, _ = eval_map(det_results, gt_bboxes, gt_labels, iou_thr=float(thr),
                        dataset=classes, print_summary=False)
        aps.append(m)
        print(f"AP@{thr:.2f}: {m:.4f}")
    print(f"AP@[0.50:0.95]: {float(np.mean(aps)):.4f}")
    return float(np.mean(aps))


def main():
    from hvrnet_tpu.data import build_dataset
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser(description="COCO-protocol evaluation")
    p.add_argument("result")
    p.add_argument("config")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data.test), dict(test_mode=True))
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    if args.json_out:
        results2json(dataset, results, args.json_out)
        print(f"wrote {args.json_out}")
    gt_bboxes = [dataset.get_ann_info(i)["bboxes"] for i in range(len(dataset))]
    gt_labels = [dataset.get_ann_info(i)["labels"] for i in range(len(dataset))]
    coco_style_eval(results, gt_bboxes, gt_labels, dataset.CLASSES)


if __name__ == "__main__":
    main()
