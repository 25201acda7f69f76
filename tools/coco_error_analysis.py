"""Detection error analysis (counterpart of
`/root/reference/tools/coco_error_analysis.py`, 174 LoC).

Produces the reference's per-class stacked precision-recall error
decomposition — the seven bands C75 / C50 / Loc / Sim / Oth / BG / FN
(`makeplot`, coco_error_analysis.py:12-50) — adapted from pycocotools to the
VID evaluation stack:

* C75/C50/Loc: PR at IoU 0.75 / 0.50 / 0.10 (progressively forgiving
  localization error);
* Sim: supercategory confusion forgiven.  VID's 30 classes carry no
  supercategory hierarchy (each class is its own supercategory), so the
  reference's ``supNms`` grouping degenerates and Sim == Loc — the band is
  kept for surface parity and drawn with zero height;
* Oth: ANY class confusion forgiven (other classes' GT becomes ignore
  regions, reference :86-99);
* BG: background false positives removed (precision snaps to 1 wherever any
  precision remained, reference cocoanalyze convention);
* FN: false negatives forgiven (precision 1 everywhere).

Per-area splits (allarea/small/medium/large, reference :23) are applied by
marking out-of-range GT as ignore.  One PNG per class plus the all-class
mean, written to ``--out-dir``; a text summary of the band APs goes to
stdout and ``--out``.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECALL_GRID = np.linspace(0.0, 1.0, 101)
AREA_RANGES = dict(allarea=(0.0, 1e10), small=(0.0, 32 ** 2),
                   medium=(32 ** 2, 96 ** 2), large=(96 ** 2, 1e10))
BAND_NAMES = ["C75", "C50", "Loc", "Sim", "Oth", "BG", "FN"]
BAND_COLORS = [(0.31, 0.51, 0.74), (0.75, 0.31, 0.30), (0.36, 0.90, 0.38),
               (0.50, 0.39, 0.64), (1.0, 0.6, 0.0), (0.7, 0.7, 0.7),
               (0.9, 0.9, 0.9)]


def _area(boxes):
    return np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * \
        np.clip(boxes[:, 3] - boxes[:, 1], 0, None)


def pr_curve(cls_dets, cls_gts, cls_ignores, iou_thr):
    """Rank-accumulated PR sampled on RECALL_GRID (the mean_ap.py matching
    with COCO-style 101-point sampling)."""
    from hvrnet_tpu.core.evaluation.mean_ap import tpfp_default
    tps, fps, scores = [], [], []
    n_gt = 0
    for det, gt, ign in zip(cls_dets, cls_gts, cls_ignores):
        n_gt += int((~ign).sum())         # ign: per-GT bool flags
        if det.shape[0] == 0:
            continue
        tp, fp = tpfp_default(det, gt, ign, iou_thr)
        tps.append(tp[0])
        fps.append(fp[0])
        scores.append(det[:, 4])
    if not scores or n_gt == 0:
        return np.zeros_like(RECALL_GRID), 0.0
    tp = np.concatenate(tps)
    fp = np.concatenate(fps)
    order = np.argsort(-np.concatenate(scores))
    tp = np.cumsum(tp[order])
    fp = np.cumsum(fp[order])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    # monotone envelope then sample at the recall grid (COCO accumulate)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ps = np.zeros_like(RECALL_GRID)
    inds = np.searchsorted(recall, RECALL_GRID, side="left")
    valid = inds < len(precision)
    ps[valid] = precision[inds[valid]]
    return ps, float(ps.mean())


def class_bands(results, gt_bboxes, gt_labels, cls, area=(0.0, 1e10)):
    """The 7 error-decomposition PR curves for one 0-based class index."""
    from hvrnet_tpu.core.evaluation.mean_ap import get_cls_results
    cls_dets, cls_gts, cls_ign = get_cls_results(results, gt_bboxes,
                                                 gt_labels, None, cls)
    lo, hi = area
    # ignore is a per-GT BOOL FLAG aligned with the gt array (tpfp_default
    # contract): out-of-area GT keeps its box but flips the flag; for the
    # Oth band the other classes' GT boxes are appended flagged-ignore so
    # confusion matches count neither as TP nor FP
    gts_a, flags_a = [], []
    gts_conf, flags_conf = [], []
    for j, g in enumerate(cls_gts):
        g = np.asarray(g, np.float32).reshape(-1, 4)
        a = _area(g) if len(g) else np.zeros((0,))
        out_rng = ~((a >= lo) & (a < hi))
        f = np.asarray(cls_ign[j], bool) | out_rng
        gts_a.append(g)
        flags_a.append(f)
        other = np.asarray(gt_bboxes[j][gt_labels[j] != cls + 1],
                           np.float32).reshape(-1, 4)
        gts_conf.append(np.concatenate([g, other]))
        flags_conf.append(np.concatenate([f, np.ones(len(other), bool)]))
    ps = np.zeros((7, len(RECALL_GRID)))
    ps[0], _ = pr_curve(cls_dets, gts_a, flags_a, 0.75)       # C75
    ps[1], _ = pr_curve(cls_dets, gts_a, flags_a, 0.50)       # C50
    ps[2], _ = pr_curve(cls_dets, gts_a, flags_a, 0.10)       # Loc
    ps[3] = ps[2]                                             # Sim (flat tree)
    ps[4], _ = pr_curve(cls_dets, gts_conf, flags_conf, 0.10)  # Oth
    ps[5] = np.where(ps[4] > 0, 1.0, 0.0)                     # BG removed
    ps[6] = np.ones_like(RECALL_GRID)                         # FN forgiven
    return ps


def make_plot(ps, out_path, title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure()
    ax = plt.subplot(111)
    prev = np.zeros_like(RECALL_GRID)
    for k in range(7):
        ap = ps[k].mean()
        ax.plot(RECALL_GRID, ps[k], color=(0, 0, 0), linewidth=0.5)
        ax.fill_between(RECALL_GRID, prev, np.maximum(prev, ps[k]),
                        color=BAND_COLORS[k],
                        label=f"[{ap:.3f}]{BAND_NAMES[k]}")
        prev = np.maximum(prev, ps[k])
    plt.xlabel("recall")
    plt.ylabel("precision")
    plt.xlim(0, 1.0)
    plt.ylim(0, 1.0)
    plt.title(title)
    plt.legend()
    fig.savefig(out_path)
    plt.close(fig)


def main():
    from hvrnet_tpu.data import VID_CLASSES, build_dataset
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser(description="detection error analysis")
    p.add_argument("result")
    p.add_argument("config")
    p.add_argument("--out", default="error_analysis.txt")
    p.add_argument("--out-dir", default=None,
                   help="write per-class stacked PR plots here "
                        "(reference makeplot PNGs); omit for text-only")
    p.add_argument("--areas", nargs="+", choices=list(AREA_RANGES),
                   default=["allarea"])
    p.add_argument("--types", nargs="+", choices=["bbox"], default=["bbox"],
                   help="analysis types (VID is box-only)")
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data.test), dict(test_mode=True,
                                                      world_size=1))
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    if results and isinstance(results[0], list) and len(results[0]) == 2 \
            and isinstance(results[0][0], list):
        results = [r[1] if r is not None else None for r in results]
    empty = [np.zeros((0, 5), np.float32) for _ in range(30)]
    results = [r if r is not None else empty for r in results]
    gt_bboxes, gt_labels = [], []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        gt_bboxes.append(ann["bboxes"])
        gt_labels.append(ann["labels"])

    n_cls = len(results[0])
    lines = []
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    for area in args.areas:
        rng = AREA_RANGES[area]
        mean_ps = np.zeros((7, len(RECALL_GRID)))
        n_present = 0
        for c in range(n_cls):
            has_gt = any((gl == c + 1).any() for gl in gt_labels)
            if not has_gt:
                continue
            ps = class_bands(results, gt_bboxes, gt_labels, c, rng)
            mean_ps += ps
            n_present += 1
            name = VID_CLASSES[c] if c < len(VID_CLASSES) else str(c)
            aps = " ".join(f"{BAND_NAMES[k]}={ps[k].mean():.3f}"
                           for k in range(7))
            lines.append(f"[{area}] {name:>14}: {aps}")
            if args.out_dir:
                make_plot(ps, os.path.join(args.out_dir,
                                           f"bbox-{name}-{area}.png"),
                          f"bbox-{name}-{area}")
        if n_present:
            mean_ps /= n_present
            aps = " ".join(f"{BAND_NAMES[k]}={mean_ps[k].mean():.3f}"
                           for k in range(7))
            lines.append(f"[{area}] {'ALL':>14}: {aps}")
            if args.out_dir:
                make_plot(mean_ps, os.path.join(args.out_dir,
                                                f"bbox-allclass-{area}.png"),
                          f"bbox-allclass-{area}")
    report = "\n".join(lines)
    print(report)
    with open(args.out, "w") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
