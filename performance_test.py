#!/usr/bin/env python
"""Black-box performance ablation harness.

Parity surface: reference ``performance_test.py`` — runs the evaluation
pipeline under each {ESS,ERT} config via subprocess with a timeout, collects
wall-clock, writes ``performance_test_results.txt``. Here each config is a
``run.py --type network`` invocation with config overrides (no yaml
rewriting needed — the CLI override surface does it).
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time


CONFIGS = [
    ("baseline", ["enable_ess", "False", "enable_ert", "False"]),
    ("ess_only", ["enable_ess", "True", "enable_ert", "False"]),
    ("ert_only", ["enable_ess", "False", "enable_ert", "True"]),
    ("ess_ert", ["enable_ess", "True", "enable_ert", "True"]),
]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", default="configs/nerf/lego.yaml")
    parser.add_argument("--timeout", type=int, default=600)
    parser.add_argument("--data_root", default="/root/reference/data/nerf_synthetic")
    args, extra = parser.parse_known_args(argv)

    results = {}
    for name, opts in CONFIGS:
        cmd = [
            sys.executable, "-u", "run.py", "--type", "network",
            "--cfg_file", args.cfg_file,
            "test_dataset.data_root", args.data_root,
            *opts, *extra,
        ]
        print(f"=== {name}: {' '.join(opts)} ===")
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.timeout)
            dt = time.time() - t0
            tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
            print(tail)
            results[name] = {"wall_s": dt, "ok": proc.returncode == 0,
                             "tail": tail}
        except subprocess.TimeoutExpired:
            results[name] = {"wall_s": args.timeout, "ok": False,
                             "tail": "TIMEOUT"}
            print("TIMEOUT")

    with open("performance_test_results.txt", "w") as f:
        f.write("config       wall_s  ok\n")
        for name, r in results.items():
            f.write(f"{name:<12} {r['wall_s']:7.1f}  {r['ok']}\n")
            for line in r["tail"].splitlines():
                f.write(f"    {line}\n")
        base = results.get("baseline", {}).get("wall_s")
        if base:
            f.write("\nspeedups vs baseline (wall-clock, incl. compile):\n")
            for name, r in results.items():
                f.write(f"  {name}: {base / r['wall_s']:.2f}x\n")
    print("written: performance_test_results.txt")


if __name__ == "__main__":
    main(sys.argv[1:])
