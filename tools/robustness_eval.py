"""Corruption-benchmark result analysis (counterpart of
`/root/reference/tools/robustness_eval.py`, 256 LoC).

Aggregates the per-corruption/per-severity result pickles written by
`tools/test_robustness.py` into the reference's report surface:

* a per-corruption × per-severity mAP table with per-corruption means,
* P (clean performance), mPC (mean performance under corruption) and rPC
  (relative performance, mPC/P) — selectable via ``--prints`` exactly like
  the reference (robustness_eval.py:164-186),
* ``--aggregate benchmark|all`` (reference :41,78-81 averages the first 15
  "benchmark" corruptions; here the benchmark set is the families
  test_robustness.py implements),
* ``--task`` filtering (reference :96-101 supports bbox/segm; this stack is
  box-only, so segm requests report bbox with a notice, the reference's own
  VOC behavior, :171-177).

VID eval is VOC-style AP50, so the scalar mAP plays the role of the
reference's voc-style path (`get_voc_style_results`, :113-158).
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the corruption families test_robustness.py implements — its "benchmark"
#: set (the reference's benchmark = the 15 imagecorruptions; holdout
#: corruptions are excluded from mPC under --aggregate benchmark)
BENCHMARK_CORRUPTIONS = (
    "gaussian_noise", "shot_noise", "impulse_noise",
    "gaussian_blur", "motion_blur",
    "fog", "brightness",
    "contrast", "jpeg_compression", "pixelate",
)


def collect(prefix, config, cache=None):
    """Evaluate every ``{prefix}_{corruption}_s{severity}.pkl`` →
    {corruption: {severity: mAP}}."""
    from tools.vid_eval import evaluate_results
    table = defaultdict(dict)
    for path in sorted(glob.glob(f"{prefix}_*_s*.pkl")):
        m = re.match(rf"{re.escape(os.path.basename(prefix))}_(.+)_s(\d+)\.pkl",
                     os.path.basename(path))
        if not m:
            continue
        corruption, severity = m.group(1), int(m.group(2))
        mean_ap, _ = evaluate_results(path, config, quiet=True)
        table[corruption][severity] = float(mean_ap)
    return table


def print_table(table):
    severities = sorted({s for v in table.values() for s in v})
    head = f"{'corruption':<20}" + "".join(f"{'s' + str(s):>8}"
                                           for s in severities)
    print(head + f"{'mean':>8}")
    print("-" * len(head + "        "))
    for c in sorted(table):
        row = f"{c:<20}"
        vals = []
        for s in severities:
            v = table[c].get(s)
            row += f"{v:>8.4f}" if v is not None else f"{'-':>8}"
            if v is not None:
                vals.append(v)
        row += f"{np.mean(vals):>8.4f}" if vals else f"{'-':>8}"
        print(row)


def summarize(table, clean_ap=None, prints=("mPC",), aggregate="benchmark"):
    cs = [c for c in table
          if aggregate == "all" or c in BENCHMARK_CORRUPTIONS]
    if not cs:
        print("no corruption results in the requested aggregate set")
        return
    mpc = float(np.mean([np.mean(list(table[c].values())) for c in cs]))
    if "P" in prints:
        if clean_ap is None:
            print("P requested but no --clean-result given")
        else:
            print(f"{'Performance on Clean Data [P] in AP50':<48} = "
                  f"{clean_ap:.3f}")
    if "mPC" in prints:
        print(f"{'Mean Performance under Corruption [mPC] in AP50':<48} = "
              f"{mpc:.3f}")
    if "rPC" in prints:
        if clean_ap is None:
            print("rPC requested but no --clean-result given")
        else:
            print(f"{'Relative Performance under Corruption [rPC] in %':<48}"
                  f" = {mpc / max(clean_ap, 1e-9) * 100:.1f}")


def main():
    p = argparse.ArgumentParser(description="Corruption Result Analysis")
    p.add_argument("config")
    p.add_argument("--prefix", default="robustness",
                   help="result-pickle prefix used by test_robustness.py")
    p.add_argument("--task", nargs="+", choices=["bbox", "segm"],
                   default=["bbox"])
    p.add_argument("--prints", nargs="+", choices=["P", "mPC", "rPC"],
                   default=["mPC"])
    p.add_argument("--aggregate", choices=["benchmark", "all"],
                   default="benchmark")
    p.add_argument("--clean-result", default=None,
                   help="clean (uncorrupted) results pickle for P / rPC")
    args = p.parse_args()

    for task in args.task:
        if task != "bbox":
            print("Only bbox analysis is supported for VID\n"
                  "Will report bbox results\n")
    table = collect(args.prefix, args.config)
    if not table:
        print("no robustness result files found")
        return
    clean_ap = None
    if args.clean_result:
        from tools.vid_eval import evaluate_results
        clean_ap, _ = evaluate_results(args.clean_result, args.config,
                                       quiet=True)
        clean_ap = float(clean_ap)
    print(f"model results: {args.prefix}_*.pkl ({len(table)} corruptions)\n")
    print_table(table)
    print()
    summarize(table, clean_ap, tuple(args.prints), args.aggregate)


if __name__ == "__main__":
    main()
