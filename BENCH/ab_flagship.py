#!/usr/bin/env python
"""Same-window A/B of the flagship sf0.1 bench between two checkouts.

VERDICT r3 "Next round" #1: the 28.1s -> 44.6s flagship regression had no
same-window attribution (every query drifted in the same run; the host's
memory bandwidth is known to vary ~4x between days). Protocol — the same
discipline BENCH/BASELINE.md used for the scaling control:

  for pair in 1..N_PAIRS:            # interleaved, one session
      run `python bench.py flagship_dedup` in checkout A (fresh JVM)
      run `python bench.py flagship_dedup` in checkout B (fresh JVM)

Interleaving means any host drift hits both binaries equally within a
pair; the per-pair RATIO is the drift-free signal. Results append to
BENCH/ab_flagship_results.jsonl and a summary prints at the end.

Usage: python BENCH/ab_flagship.py LABEL_A:DIR_A LABEL_B:DIR_B [n_pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "ab_flagship_results.jsonl")


def run_one(label: str, cwd: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py", "flagship_dedup"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900,
    )
    wall = time.time() - t0
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    try:
        parsed = json.loads(line)
    except json.JSONDecodeError:
        parsed = {"error": p.stderr[-500:]}
    rec = {
        "label": label,
        "cwd": cwd,
        "rc": p.returncode,
        "wall": round(wall, 2),
        "flagship": parsed.get("queries", {}).get("flagship_dedup"),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    a_label, a_dir = sys.argv[1].split(":", 1)
    b_label, b_dir = sys.argv[2].split(":", 1)
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    results: dict[str, list[float]] = {a_label: [], b_label: []}
    ratios = []
    for i in range(n_pairs):
        ra = run_one(a_label, a_dir)
        rb = run_one(b_label, b_dir)
        if ra["flagship"] and rb["flagship"]:
            results[a_label].append(ra["flagship"])
            results[b_label].append(rb["flagship"])
            ratios.append(rb["flagship"] / ra["flagship"])
    summary = {
        "pairs": n_pairs,
        a_label: {
            "median": round(statistics.median(results[a_label]), 2),
            "runs": results[a_label],
        },
        b_label: {
            "median": round(statistics.median(results[b_label]), 2),
            "runs": results[b_label],
        },
        f"{b_label}/{a_label}_per_pair_ratio": [round(r, 3) for r in ratios],
        f"{b_label}/{a_label}_median_ratio": round(statistics.median(ratios), 3)
        if ratios else None,
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
