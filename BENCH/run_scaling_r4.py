#!/usr/bin/env python
"""Round-4 scaling protocol: HEAD and the r2-binary CONTROL interleaved
in ONE window (VERDICT r3 "Next round" #3).

Round 3's lesson: this VM's N->4N ratio collapses environmentally (the
byte-identical r2 binary measured 0.554 on its own day and 0.053 on
r3's day), so a raw ratio is only interpretable NEXT TO a control
measured in the same hour. Protocol:

  per rep (x RUNS):
    for cpus in LEGS:                      # e.g. 8, 32
      for binary in (head, r2-control):    # interleaved within the rep
        wait for the host probe to be healthy, then run one fresh
        `bench.py synth_dedup_Nk` subprocess (1 untimed warmup pipeline)
  measure cpu + DRAM-bandwidth ceilings with the same 3-median protocol

Efficiency(binary) = tput(4N)/(4*tput(N)) from per-leg medians; the
published number is HEAD's, interpreted against the same-window control
and ceilings. Appends a Round-4 section to BENCH/BASELINE.md (or
$BASELINE_OUT) and prints one summary JSON line.

Env: SCALING_DOCS (200000), SCALING_RUNS (5), SCALING_LEGS ("8,32"),
R2_DIR (/root/repo/.ab_r2).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from host_probe import HEALTHY_SEC, wait_healthy  # noqa: E402
from run_scaling import bandwidth_ceiling, host_ceiling  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SCALING_DOCS", "200000"))
RUNS = int(os.environ.get("SCALING_RUNS", "5"))
LEGS = [int(x) for x in os.environ.get("SCALING_LEGS", "8,32").split(",")]
R2_DIR = os.environ.get("R2_DIR", os.path.join(REPO, ".ab_r2"))
BINARIES = {"head": REPO, "r2": R2_DIR}
KEY = f"synth_dedup_{DOCS // 1000}k"


def run_leg(cwd: str, cpus: int) -> float:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_SYNTH_DOCS=str(DOCS),
        BENCH_WARMUP_RUNS=os.environ.get("BENCH_WARMUP_RUNS", "1"),
        # the protocol's outlier control is the 5-run median per leg;
        # keep one timed pipeline per subprocess
        BENCH_QUERY_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py", KEY],
        env=env, capture_output=True, text=True, cwd=cwd, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    return parsed["queries"][KEY], parsed.get("synth_stage_times", {})


R2_COMMIT = "17c9850"  # round-2 control binary (own-day efficiency 0.554)


def ensure_r2_checkout() -> None:
    """Recreate the control worktree if a cleanup removed it (gitignored,
    so it vanishes between sessions)."""
    if os.path.isdir(R2_DIR):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", R2_DIR, R2_COMMIT],
        cwd=REPO, check=True, capture_output=True, text=True,
    )


def main() -> None:
    ensure_r2_checkout()
    walls: dict[str, dict[int, list[float]]] = {
        b: {c: [] for c in LEGS} for b in BINARIES
    }
    probes: list[float] = []
    log_path = os.path.join(REPO, "BENCH", os.environ.get("SCALING_LOG", "scaling_r4.log"))
    log = open(log_path, "a")
    for rep in range(RUNS):
        for cpus in LEGS:
            # alternate binary order per rep: whoever runs FIRST in a leg
            # pays that leg's fresh-page first-touch cost on this host
            # (measured round 5: head@32 stalled 110-115s twice in a row
            # while the r2 control, always second, ran 31s — the fixed
            # dict order was handicapping HEAD, scaling_r5_orderbias.log)
            order = list(BINARIES.items())
            if rep % 2 == 1:
                order.reverse()
            for label, cwd in order:
                healthy, p = wait_healthy()
                probes.append(round(p, 3))
                t0 = time.time()
                w, stages = run_leg(cwd, cpus)
                walls[label][cpus].append(w)
                rec = {
                    "rep": rep, "binary": label, "cpus": cpus, "wall": w,
                    "probe": round(p, 3), "sub_wall": round(time.time() - t0, 1),
                    "stages": stages,
                }
                print(json.dumps(rec), flush=True)
                log.write(json.dumps(rec) + "\n")
                log.flush()

    ceiling = host_ceiling(LEGS)
    bw = bandwidth_ceiling(LEGS)

    def med(label: str, cpus: int) -> float:
        return statistics.median(walls[label][cpus])

    def tput(label: str, cpus: int) -> float:
        return DOCS / med(label, cpus)

    pairs = [(LEGS[i], LEGS[i + 1]) for i in range(len(LEGS) - 1)
             if LEGS[i + 1] == 4 * LEGS[i]]
    summary = {
        "docs": DOCS, "runs_per_leg": RUNS, "probes": probes,
        "throughput": {
            b: {str(c): round(tput(b, c), 1) for c in LEGS} for b in BINARIES
        },
        "walls": {b: {str(c): walls[b][c] for c in LEGS} for b in BINARIES},
        "host_ceiling_units_per_sec": {str(c): round(ceiling[c]) for c in LEGS},
        "host_bandwidth_bytes_per_sec": {str(c): round(bw[c]) for c in LEGS},
        "pairs": {
            f"{lo}->{hi}": {
                **{
                    f"{b}_efficiency": round(tput(b, hi) / (4 * tput(b, lo)), 3)
                    for b in BINARIES
                },
                "cpu_ceiling_efficiency": round(ceiling[hi] / (4 * ceiling[lo]), 3),
                "bw_ceiling_efficiency": round(bw[hi] / (4 * bw[lo]), 3),
                **{
                    f"{b}_normalized": round(
                        (tput(b, hi) / (4 * tput(b, lo)))
                        / (ceiling[hi] / (4 * ceiling[lo])),
                        3,
                    )
                    for b in BINARIES
                },
            }
            for lo, hi in pairs
        },
        "target": 0.8,
    }

    leg_rows = "\n".join(
        f"| {b} | local[{c}] | {med(b, c):.1f} | {round(tput(b, c), 1)} | "
        f"{sorted(round(w, 1) for w in walls[b][c])} |"
        for b in BINARIES for c in LEGS
    )
    pair_rows = "\n".join(
        f"| {lo}->{hi} | {summary['pairs'][k]['head_efficiency']} | "
        f"{summary['pairs'][k]['r2_efficiency']} | "
        f"{summary['pairs'][k]['cpu_ceiling_efficiency']} | "
        f"{summary['pairs'][k]['bw_ceiling_efficiency']} | "
        f"{summary['pairs'][k]['head_normalized']} |"
        for lo, hi in pairs for k in [f"{lo}->{hi}"]
    )
    title = os.environ.get("SCALING_TITLE", "Round-4")
    md = f"""

## {title} scaling run — HEAD vs same-window r2 control

{RUNS} reps x {len(LEGS)} legs x 2 binaries, fully interleaved in one
session, every run probe-gated (healthy < {HEALTHY_SEC}s) with 1 untimed
warmup pipeline per subprocess; ceilings measured the same hour with the
same 3-median warm-pool protocol. The r2 control is the unchanged
round-2 checkout (`.ab_r2`) whose own-day efficiency was 0.554 — its
same-window number calibrates how much of any ratio shortfall is the
host, not the engine.

| binary | parallelism | wall median (s) | docs/sec | walls |
|---|---|---|---|---|
{leg_rows}

| pair | HEAD eff | r2 control eff | cpu ceiling | bw ceiling | HEAD normalized |
|---|---|---|---|---|---|
{pair_rows}

Raw: `{json.dumps(summary)}`
"""
    out_name = os.environ.get("BASELINE_OUT", os.path.join("BENCH", "BASELINE.md"))
    with open(os.path.join(REPO, out_name), "a") as f:
        f.write(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
