"""Training-log analysis (counterpart of `/root/reference/tools/analyze_logs.py`,
284 LoC): loss/metric-curve plotting and iteration-time statistics from JSONL
train logs, with the reference's full invocation surface — multiple logs
compared on one figure (`plot_curve log1.json log2.json --keys loss`),
per-epoch time statistics with outlier handling (`cal_train_time
--include-outliers`), `--legend/--title/--backend/--style/--out`, and a
general `merge_logs` subcommand (the reference's `merge_json_logs`,
analyze_logs.py:230-262, hardcodes two private paths and a 5400-iter offset;
here the logs and the iter rebase are arguments).

Log format: one JSON object per line with at least ``epoch``; training lines
carry ``iter``, ``time`` and loss keys, eval lines carry mAP-like keys — the
format `engine/runners.py` emits and mmcv's TextLoggerHook emitted for the
reference.
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict


def load_log(path):
    """path → {epoch: {key: [values in line order]}}."""
    by_epoch: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            e = json.loads(line)
            ep = int(e.pop("epoch", 0))
            d = by_epoch.setdefault(ep, defaultdict(list))
            for k, v in e.items():
                d[k].append(v)
    return by_epoch


def cal_train_time(logs, names, include_outliers=False):
    for log, name in zip(logs, names):
        print(f"----- train time of {name} -----")
        per_epoch = []
        for ep in sorted(log):
            ts = [t for t in log[ep].get("time", []) if t is not None]
            if not include_outliers and len(ts) > 1:
                # drop each epoch's first iter (compile / data warmup spike)
                ts = ts[1:]
            if ts:
                per_epoch.append((ep, sum(ts) / len(ts), max(ts), len(ts)))
        if not per_epoch:
            print("  no time entries")
            continue
        means = [m for _, m, _, _ in per_epoch]
        slow = max(per_epoch, key=lambda r: r[1])
        fast = min(per_epoch, key=lambda r: r[1])
        import statistics
        std = statistics.pstdev(means) if len(means) > 1 else 0.0
        print(f"{'epoch':>6} {'mean_iter(s)':>12} {'max_iter(s)':>12} "
              f"{'iters':>6}")
        for ep, mean, mx, n in per_epoch:
            print(f"{ep:>6} {mean:>12.4f} {mx:>12.4f} {n:>6}")
        print(f"slowest epoch {slow[0]}, average time is {slow[1]:.4f}")
        print(f"fastest epoch {fast[0]}, average time is {fast[1]:.4f}")
        print(f"time std over epochs is {std:.4f}")
        print(f"average iter time: {sum(means) / len(means):.4f} s/iter")
        print()


def _iter_series(log, key):
    """Concatenate a per-iter metric across epochs on a global-iter x axis."""
    xs, ys = [], []
    base = 0
    for ep in sorted(log):
        iters = log[ep].get("iter", [])
        vals = log[ep].get(key, [])
        n = min(len(iters), len(vals))
        for i in range(n):
            if vals[i] is not None:
                xs.append(base + iters[i])
                ys.append(vals[i])
        if iters:
            base += iters[-1]
    return xs, ys


def _epoch_series(log, key):
    """One value per epoch (eval metrics like mAP)."""
    xs, ys = [], []
    for ep in sorted(log):
        vals = [v for v in log[ep].get(key, []) if v is not None]
        if vals:
            xs.append(ep)
            ys.append(vals[-1])
    return xs, ys


def plot_curve(logs, names, keys, out=None, title=None, legend=None,
               backend=None, style=None):
    import matplotlib
    matplotlib.use(backend or "Agg")
    import matplotlib.pyplot as plt
    if style:
        try:
            plt.style.use(style)
        except OSError:
            pass                     # seaborn styles absent from this image
    if legend is None:
        legend = [f"{n}_{k}" for n in names for k in keys]
    assert len(legend) == len(names) * len(keys), \
        "--legend must have one entry per (log, key) pair"
    li = 0
    for log, name in zip(logs, names):
        for key in keys:
            if "mAP" in key or key.startswith("val/"):
                xs, ys = _epoch_series(log, key)
                plt.xlabel("epoch")
                marker = "o"
            else:
                xs, ys = _iter_series(log, key)
                plt.xlabel("iter")
                marker = None
            if not xs:
                print(f"warning: {name} has no entries for {key}")
                li += 1
                continue
            plt.plot(xs, ys, label=legend[li], marker=marker, linewidth=0.8)
            li += 1
    plt.legend()
    if title:
        plt.title(title)
    if out:
        plt.savefig(out)
        print(f"save curve to: {out}")
    else:
        plt.show()


def merge_logs(paths, out, rebase_iters=True):
    """Concatenate several JSONL logs into one, optionally rebasing the
    second-and-later logs' epoch-1 iters past the previous log's end (the
    resume-from-interrupt merge the reference hardcoded)."""
    merged = []
    iter_off = 0
    ep_max_iter = 0
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                e = json.loads(line)
                if rebase_iters and "iter" in e:
                    e["iter"] = int(e["iter"]) + iter_off
                    ep_max_iter = max(ep_max_iter, e["iter"])
                merged.append(e)
        iter_off = ep_max_iter
    with open(out, "w") as f:
        for e in merged:
            f.write(json.dumps(e) + "\n")
    print(f"merged {len(paths)} logs ({len(merged)} lines) -> {out}")


def main():
    p = argparse.ArgumentParser(description="Analyze training json logs")
    sub = p.add_subparsers(dest="task", required=True)

    pc = sub.add_parser("plot_curve", help="plot metric curves")
    pc.add_argument("json_logs", nargs="+")
    pc.add_argument("--keys", nargs="+", default=["loss"])
    pc.add_argument("--title", default=None)
    pc.add_argument("--legend", nargs="+", default=None)
    pc.add_argument("--backend", default=None, help="matplotlib backend")
    pc.add_argument("--style", default=None, help="matplotlib style name")
    pc.add_argument("--out", default=None)

    ct = sub.add_parser("cal_train_time", help="per-epoch iter-time stats")
    ct.add_argument("json_logs", nargs="+")
    ct.add_argument("--include-outliers", action="store_true",
                    help="keep each epoch's first iter in the average")

    mg = sub.add_parser("merge_logs", help="concatenate logs, rebasing iters")
    mg.add_argument("json_logs", nargs="+")
    mg.add_argument("--out", required=True)
    mg.add_argument("--no-rebase", action="store_true")

    args = p.parse_args()
    if args.task == "merge_logs":
        merge_logs(args.json_logs, args.out, rebase_iters=not args.no_rebase)
        return
    logs = [load_log(j) for j in args.json_logs]
    if args.task == "plot_curve":
        plot_curve(logs, args.json_logs, args.keys, args.out, args.title,
                   args.legend, args.backend, args.style)
    else:
        cal_train_time(logs, args.json_logs, args.include_outliers)


if __name__ == "__main__":
    main()
