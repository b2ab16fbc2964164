#!/usr/bin/env python
"""Summarize a jax.profiler trace: top HLO ops by total device time.

Parses the chrome-trace json (trace.json.gz) that jax.profiler writes under
<logdir>/plugins/profile/<ts>/, filters to TPU device tracks, aggregates
wall time per op name and prints the top-N table — the evidence format of
docs/PERF.md "Where the cycles actually go".

Usage: python scripts/trace_summary.py /tmp/jaxprof/train [top_n]
(Pure host-side parsing — safe to run while no TPU job is active; it does
not import jax.)
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def newest_trace(logdir: str) -> str:
    pats = [os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"),
            os.path.join(logdir, "**/*.trace.json.gz")]
    files = []
    for p in pats:
        files += glob.glob(p, recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    return max(files, key=os.path.getmtime)


def summarize(path: str, top_n: int = 25):
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: process names containing "TPU" (e.g. "/device:TPU:0")
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                device_pids.add(e["pid"])
    per_op = defaultdict(float)
    n_ev = 0
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_op[e.get("name", "?")] += dur
        n_ev += 1
        ts = e.get("ts", 0)
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + e.get("dur", 0))
    total = sum(per_op.values())
    span = (t_max - t_min) / 1e3 if n_ev else 0.0
    print(f"trace: {path}")
    print(f"device events: {n_ev}, busy {total:.1f} ms over {span:.1f} ms "
          f"span ({100*total/span if span else 0:.0f}% busy)")
    print(f"{'op':60s} {'ms':>9s} {'share':>6s}")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name[:60]:60s} {ms:9.2f} {100*ms/total:5.1f}%")
    return per_op, total


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof/train"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    summarize(newest_trace(logdir), top_n)
