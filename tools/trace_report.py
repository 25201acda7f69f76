"""Per-module / per-op device-time report from a jax.profiler xplane trace.

The ONLY trustworthy absolute device-time source on the relay (CLAUDE.md
measurement rules): capture with

    with jax.profiler.trace("/tmp/jaxtrace"):
        ... run the real program N times ...

then  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/trace_report.py [/tmp/jaxtrace]

Aggregates the XLA Modules line (wall per program execution) and attributes
XLA Ops to modules by timestamp.  Requires the baked-in tensorflow's
xplane_pb2 (pure-python protobuf mode avoids its descriptor-version check).
"""
import sys

import glob
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
f = sorted(glob.glob(root + "/plugins/profile/*/*.xplane.pb"))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(f, "rb").read())
for p in xs.planes:
    lines = {l.name: l for l in p.lines}
    if "XLA Modules" not in lines or "XLA Ops" not in lines:
        continue
    # XEvent offsets are relative to their XLine's timestamp_ns — add the
    # line bases so module windows and op midpoints share one clock (they
    # can differ between lines depending on platform/version)
    mod_base = lines["XLA Modules"].timestamp_ns * 1000
    op_base = lines["XLA Ops"].timestamp_ns * 1000
    mods = []
    per_mod_time = defaultdict(float)
    per_mod_runs = defaultdict(int)
    for ev in lines["XLA Modules"].events:
        md = p.event_metadata[ev.metadata_id]
        start = mod_base + ev.offset_ps
        mods.append((start, start + ev.duration_ps, md.name))
        per_mod_time[md.name] += ev.duration_ps / 1e9
        per_mod_runs[md.name] += 1
    mods.sort()
    per_mod_ops = defaultdict(lambda: defaultdict(float))
    for ev in lines["XLA Ops"].events:
        md = p.event_metadata[ev.metadata_id]
        mid = op_base + ev.offset_ps
        lo, hi = 0, len(mods)
        while lo < hi:
            m = (lo + hi) // 2
            if mods[m][0] <= mid:
                lo = m + 1
            else:
                hi = m
        if lo and mods[lo - 1][0] <= mid < mods[lo - 1][1]:
            per_mod_ops[mods[lo - 1][2]][md.name.split(" = ")[0]] += \
                ev.duration_ps / 1e9
    for mname, t in sorted(per_mod_time.items(), key=lambda kv: -kv[1]):
        n = per_mod_runs[mname]
        print(f"== module {mname}  runs={n}  wall {t/n:.3f} ms/run")
        for op, ms in sorted(per_mod_ops[mname].items(),
                             key=lambda kv: -kv[1])[:10]:
            print(f"   {ms/n:8.4f} ms/run  {op[:80]}")
