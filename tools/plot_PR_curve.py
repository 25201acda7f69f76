"""Plot precision-recall curves from a results pickle (counterpart of
`/root/reference/tools/plot_PR_curve.py`)."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from hvrnet_tpu.core.evaluation import eval_map
    from hvrnet_tpu.data import VID_CLASSES, build_dataset
    from hvrnet_tpu.utils.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("result")
    p.add_argument("config")
    p.add_argument("--classes", nargs="*", default=None,
                   help="class names to plot (default: all)")
    p.add_argument("--out", default="pr_curve.png")
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
    _, per_class = eval_map(results, gt_bboxes, gt_labels,
                            dataset=VID_CLASSES, print_summary=False)
    wanted = args.classes or VID_CLASSES
    for i, res in enumerate(per_class):
        name = VID_CLASSES[i] if i < len(VID_CLASSES) else str(i)
        if name in wanted and res["num_dets"]:
            plt.plot(res["recall"], res["precision"],
                     label=f"{name} (AP {float(res['ap']):.3f})", lw=1)
    plt.xlabel("recall")
    plt.ylabel("precision")
    plt.legend(fontsize=6)
    plt.savefig(args.out, dpi=150)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
