"""Aggregate corruption-benchmark results (counterpart of
`/root/reference/tools/robustness_eval.py`): mPC / rPC summaries over the
per-corruption result pickles produced by test_robustness.py."""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tools.vid_eval import evaluate_results

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--prefix", default="robustness")
    p.add_argument("--clean-result", default=None,
                   help="clean (uncorrupted) results pickle for rPC")
    args = p.parse_args()

    per_corruption = defaultdict(list)
    for path in sorted(glob.glob(f"{args.prefix}_*_s*.pkl")):
        m = re.match(rf"{re.escape(args.prefix)}_(.+)_s(\d+)\.pkl",
                     os.path.basename(path))
        if not m:
            continue
        corruption, severity = m.group(1), int(m.group(2))
        print(f"-- {corruption} s{severity}")
        mean_ap, _ = evaluate_results(path, args.config)
        per_corruption[corruption].append(mean_ap)

    if not per_corruption:
        print("no robustness result files found")
        return
    mpc = float(np.mean([np.mean(v) for v in per_corruption.values()]))
    print(f"\nmPC (mean AP under corruption): {mpc:.4f}")
    if args.clean_result:
        clean_ap, _ = evaluate_results(args.clean_result, args.config)
        print(f"clean AP: {clean_ap:.4f}")
        print(f"rPC (relative robustness): {mpc / max(clean_ap, 1e-9):.4f}")


if __name__ == "__main__":
    main()
