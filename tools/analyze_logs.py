"""Training-log analysis (counterpart of `/root/reference/tools/analyze_logs.py`):
loss-curve plotting and iteration-time statistics from the JSONL train log."""
from __future__ import annotations

import argparse
import json
from collections import defaultdict


def load_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def cal_train_time(entries):
    per_epoch = defaultdict(list)
    for e in entries:
        if "time" in e and "epoch" in e:
            per_epoch[e["epoch"]].append(e["time"])
    print(f"{'epoch':>6} {'mean_iter(s)':>12} {'max_iter(s)':>12} {'iters':>6}")
    for ep in sorted(per_epoch):
        ts = per_epoch[ep]
        print(f"{ep:>6} {sum(ts) / len(ts):>12.4f} {max(ts):>12.4f} "
              f"{len(ts):>6}")


def plot_curve(entries, keys, out=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xs = list(range(len(entries)))
    for key in keys:
        ys = [e.get(key) for e in entries]
        pts = [(x, y) for x, y in zip(xs, ys) if y is not None]
        if pts:
            plt.plot(*zip(*pts), label=key)
    plt.legend()
    plt.xlabel("log step")
    if out:
        plt.savefig(out)
        print(f"saved {out}")
    else:
        plt.show()


def main():
    p = argparse.ArgumentParser(description="Analyze training json logs")
    sub = p.add_subparsers(dest="task", required=True)
    pc = sub.add_parser("plot_curve")
    pc.add_argument("json_log")
    pc.add_argument("--keys", nargs="+", default=["loss"])
    pc.add_argument("--out", default=None)
    ct = sub.add_parser("cal_train_time")
    ct.add_argument("json_log")
    args = p.parse_args()
    entries = load_log(args.json_log)
    if args.task == "plot_curve":
        plot_curve(entries, args.keys, args.out)
    else:
        cal_train_time(entries)


if __name__ == "__main__":
    main()
