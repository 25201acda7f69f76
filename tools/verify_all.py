"""One-command regression gate over every driver surface (VERDICT r3 #8).

Runs, in order:
  1. the fast test subset (core ops / parity / eval — the judge's spot-check
     set plus the optimizer unit tests),
  2. `__graft_entry__.dryrun_multichip(8)` with the known-good loss band,
  3. `bench.py` at the headline and the 63-frame reference operating points,
     gated on conservative throughput floors.

Exit code 0 = all green.  Bench floors are deliberately BELOW the recorded
tenancy bands (BASELINE.md: repeat readings on unchanged code span 59-203
fps on this relay) — they catch genuine breakage (compile failure, a 10×
regression), not tenancy weather; on a floor violation the bench is retried
once before failing.  Use --skip-bench on machines without the TPU tunnel.

Usage: python tools/verify_all.py [--skip-bench] [--skip-dryrun] [--fast]
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import re
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

FAST_TESTS = [
    "tests/test_ops_nms.py", "tests/test_ops_roi_align.py",
    "tests/test_ops_boxes.py", "tests/test_head_parity.py",
    "tests/test_eval_map.py", "tests/test_optim.py",
]

# Known-good dryrun loss on seed 0 (CLAUDE.md): 77.1612-77.1613; the last
# digit moves with conv reduction order, so gate a slightly wider band.
DRYRUN_LOSS_BAND = (77.155, 77.168)

# Floors ≈ half of each point's recorded quiet-tenancy band low — a genuine
# regression (not tenancy) if violated twice in a row.
BENCH_FLOORS = {(): 80.0, ("--window", "63"): 55.0}


def run(cmd, timeout, label):
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    dt = time.time() - t0
    ok = r.returncode == 0
    print(f"[{'ok' if ok else 'FAIL'}] {label} ({dt:.0f}s)", flush=True)
    if not ok:
        print(r.stdout[-3000:], file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
    return ok, r.stdout


def gate_tests() -> bool:
    ok, _ = run([sys.executable, "-m", "pytest", *FAST_TESTS, "-q",
                 "--no-header"], timeout=1800, label="fast test subset")
    return ok


def gate_dryrun() -> bool:
    ok, out = run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        timeout=900, label="dryrun_multichip(8)")
    if not ok:
        return False
    m = re.search(r"loss ([0-9.]+)", out)
    if not m:
        print("FAIL: dryrun printed no loss", file=sys.stderr)
        return False
    loss = float(m.group(1))
    lo, hi = DRYRUN_LOSS_BAND
    if not (lo <= loss <= hi):
        print(f"FAIL: dryrun loss {loss} outside known-good band "
              f"[{lo}, {hi}]", file=sys.stderr)
        return False
    print(f"     dryrun loss {loss} in band [{lo}, {hi}]")
    return True


def bench_once(extra):
    ok, out = run([sys.executable, "bench.py", *extra], timeout=1800,
                  label=f"bench.py {' '.join(extra) or '(headline)'}")
    if not ok:
        return None
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def gate_bench() -> bool:
    all_ok = True
    for extra, floor in BENCH_FLOORS.items():
        res = bench_once(list(extra))
        if res is not None and res["value"] < floor:
            print(f"     {res['value']} fps below floor {floor} — retrying "
                  "once (tenancy check)", flush=True)
            res = bench_once(list(extra))
        if res is None:
            all_ok = False
            continue
        ok = res["value"] >= floor
        print(f"     {res['metric']}: {res['value']} {res['unit']} "
              f"(floor {floor}) {'ok' if ok else 'FAIL'}", flush=True)
        all_ok &= ok
    return all_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true",
                    help="no TPU available (CPU-only machine)")
    ap.add_argument("--skip-dryrun", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="tests only (the pre-commit quick gate)")
    args = ap.parse_args()

    results = {"tests": gate_tests()}
    if not args.fast and not args.skip_dryrun:
        results["dryrun"] = gate_dryrun()
    if not args.fast and not args.skip_bench:
        results["bench"] = gate_bench()

    print("== verify_all:", json.dumps(results), flush=True)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
