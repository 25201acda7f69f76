"""Detection error analysis (counterpart of
`/root/reference/tools/coco_error_analysis.py`): per-class breakdown of AP at
strict/loose IoU plus localization / confusion / background FP shares."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from hvrnet_tpu.core.evaluation import eval_map, tpfp_default
    from hvrnet_tpu.core.evaluation.mean_ap import (bbox_overlaps_np,
                                                    get_cls_results)
    from hvrnet_tpu.data import VID_CLASSES, build_dataset
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("result")
    p.add_argument("config")
    p.add_argument("--out", default="error_analysis.txt")
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data.test), dict(test_mode=True,
                                                      world_size=1))
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    gt_bboxes, gt_labels = [], []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        gt_bboxes.append(ann["bboxes"])
        gt_labels.append(ann["labels"])

    ap_strict, _ = eval_map(results, gt_bboxes, gt_labels, iou_thr=0.75,
                            dataset=VID_CLASSES, print_summary=False)
    ap_50, per_cls = eval_map(results, gt_bboxes, gt_labels, iou_thr=0.5,
                              dataset=VID_CLASSES, print_summary=False)
    ap_loose, _ = eval_map(results, gt_bboxes, gt_labels, iou_thr=0.1,
                           dataset=VID_CLASSES, print_summary=False)

    lines = [f"AP@0.75={ap_strict:.4f}  AP@0.50={ap_50:.4f}  "
             f"AP@0.10={ap_loose:.4f}",
             f"localization headroom (AP@0.10 − AP@0.50): "
             f"{ap_loose - ap_50:.4f}"]
    # per-class FP decomposition at IoU 0.5
    for c in range(len(results[0])):
        cls_dets, cls_gts, cls_ign = get_cls_results(results, gt_bboxes,
                                                     gt_labels, None, c)
        n_fp = n_conf = n_det = 0
        for j in range(len(cls_dets)):
            det = cls_dets[j]
            if det.shape[0] == 0:
                continue
            _, fp = tpfp_default(det, cls_gts[j], cls_ign[j], 0.5)
            other = gt_bboxes[j][gt_labels[j] != c + 1]
            if other.shape[0] and det.shape[0]:
                ious = bbox_overlaps_np(det[:, :4], other)
                conf = (ious.max(axis=1) >= 0.5) & (fp[0] > 0)
                n_conf += int(conf.sum())
            n_fp += int(fp.sum())
            n_det += det.shape[0]
        name = VID_CLASSES[c] if c < len(VID_CLASSES) else str(c)
        if n_det:
            lines.append(f"{name:>14}: dets={n_det} fp={n_fp} "
                         f"class-confusion-fp={n_conf}")
    report = "\n".join(lines)
    print(report)
    with open(args.out, "w") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
