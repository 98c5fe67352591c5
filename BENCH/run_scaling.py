#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: N vs 4N executors).

No multi-node cluster exists in this sandbox, so two local parallelism
levels stand in: the identical synth-dedup workload runs in fresh
subprocesses at two SPARK_GRAFT_CPUS levels (same input, same config) and
efficiency = throughput(4N) / (4 * throughput(N)).

Methodology hardening (round 2):
* THREE runs per leg, median taken — single runs on this shared VM are
  not reproducible.
* Every leg is gated on BENCH/host_probe.py: the VM's memory subsystem
  intermittently degrades ~75x on fresh-page first-touch; legs only run
  (and are only trusted) in a healthy window, and each leg records the
  probe value measured immediately before it.
* The HOST CEILING is measured alongside: the same 3-median protocol over
  a pure-CPU multiprocessing workload (no Spark, no shared state). On
  this box 8->32 workers tops out well below 4x even for embarrassingly
  parallel C code — that ceiling, not Spark, bounds the 8->32 ratio; the
  2->8 pair stays inside the VM's linear region. Both pairings are
  reported, plus efficiency normalized by the host ceiling.

Writes BENCH/BASELINE.md and prints the summary JSON.

Env knobs: SCALING_DOCS (default 200000), SCALING_RUNS (default 3),
SCALING_LEGS (default "2,8,32").
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from host_probe import HEALTHY_SEC, probe, wait_healthy  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SCALING_DOCS", "200000"))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
LEGS = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8,32").split(",")]


# ---------------------------------------------------------- host ceiling
def _cpu_work(n: int) -> int:
    h = 0
    for i in range(n):
        h ^= int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
    return h


def host_ceiling(workers: list[int], total: int = 48_000_000) -> dict[int, float]:
    """Pure-CPU throughput (work units/sec) at each worker count —
    3-median, warm pools. This is the best ANY software can scale on this
    host; Spark efficiency is judged against it."""
    out: dict[int, float] = {}
    for w in workers:
        with mp.Pool(w) as p:
            p.map(_cpu_work, [1000] * w)  # warm
            ts = []
            for _ in range(3):
                t0 = time.time()
                p.map(_cpu_work, [total // w] * w)
                ts.append(time.time() - t0)
        out[w] = total / statistics.median(ts)
    return out


_BW = {}


def _bw_init(nbytes: int) -> None:
    import numpy as np

    _BW["a"] = np.ones(nbytes // 8, dtype=np.int64)
    _BW["b"] = np.empty_like(_BW["a"])


def _bw_work(_=None) -> None:
    import numpy as np

    for _ in range(4):
        np.copyto(_BW["b"], _BW["a"])


def bandwidth_ceiling(workers: list[int], total: int = 1 << 30) -> dict[int, float]:
    """DRAM-bandwidth throughput (bytes copied/sec) at each worker count —
    warm pre-touched pools, 3-median. On this VM the memory bus saturates
    around 8 workers (measured 8->32 copy-bandwidth efficiency ~0.22), so
    shuffle/string-heavy stages CANNOT scale past ~8 local threads no
    matter what the engine does; a real cluster adds a memory bus per
    node. Reported next to the pure-CPU ceiling: the engine's workload
    mixes both regimes."""
    out: dict[int, float] = {}
    for w in workers:
        with mp.Pool(w, initializer=_bw_init, initargs=(total // w,)) as p:
            p.map(_bw_work, range(w))  # warm / first-touch
            ts = []
            for _ in range(3):
                t0 = time.time()
                p.map(_bw_work, range(w))
                ts.append(time.time() - t0)
        out[w] = total * 4 / statistics.median(ts)
    return out


# ------------------------------------------------------------- spark leg
def run_leg(cpus: int) -> dict:
    """One bench subprocess at the given parallelism; returns its JSON."""
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_SYNTH_DOCS=str(DOCS),
        BENCH_WARMUP_RUNS=os.environ.get("BENCH_WARMUP_RUNS", "1"),
        # outlier control here is the multi-run median per leg
        BENCH_QUERY_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), f"synth_dedup_{DOCS // 1000}k"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def median_leg(cpus: int) -> dict:
    """RUNS runs at this parallelism, probe-gated; median throughput."""
    results, probes = [], []
    for _ in range(RUNS):
        healthy, p = wait_healthy()
        probes.append(round(p, 3))
        results.append(run_leg(cpus))
    key = f"synth_dedup_{DOCS // 1000}k"
    walls = sorted(r["queries"][key] for r in results)
    med = walls[len(walls) // 2]
    rep = min(results, key=lambda r: abs(r["queries"][key] - med))
    return {
        "cpus": cpus,
        "wall_median": med,
        "walls": walls,
        "docs_per_sec": round(DOCS / med, 1),
        "probes": probes,
        "stage_times": rep.get("synth_stage_times", {}),
    }


def main():
    ceiling = host_ceiling(LEGS)
    bw = bandwidth_ceiling(LEGS)
    legs = {c: median_leg(c) for c in LEGS}

    def eff(lo: int, hi: int) -> float:
        return legs[hi]["docs_per_sec"] / (4 * legs[lo]["docs_per_sec"])

    def ceiling_eff(lo: int, hi: int) -> float:
        return ceiling[hi] / (4 * ceiling[lo])

    def bw_eff(lo: int, hi: int) -> float:
        return bw[hi] / (4 * bw[lo])

    pairs = [(LEGS[i], LEGS[i + 1]) for i in range(len(LEGS) - 1)
             if LEGS[i + 1] == 4 * LEGS[i]]
    summary = {
        "docs": DOCS,
        "runs_per_leg": RUNS,
        "warmup_runs": int(os.environ.get("BENCH_WARMUP_RUNS", "1")),
        "throughput": {str(c): legs[c]["docs_per_sec"] for c in LEGS},
        "host_ceiling_units_per_sec": {str(c): round(ceiling[c]) for c in LEGS},
        "host_bandwidth_bytes_per_sec": {str(c): round(bw[c]) for c in LEGS},
        "pairs": {
            f"{lo}->{hi}": {
                "efficiency": round(eff(lo, hi), 3),
                "host_ceiling_efficiency": round(ceiling_eff(lo, hi), 3),
                "host_bandwidth_efficiency": round(bw_eff(lo, hi), 3),
                "normalized": round(eff(lo, hi) / ceiling_eff(lo, hi), 3),
            }
            for lo, hi in pairs
        },
        "target": 0.8,
    }

    rows = "\n".join(
        f"| local[{c}] | {legs[c]['wall_median']} | {legs[c]['docs_per_sec']} | "
        f"{legs[c]['walls']} | {legs[c]['probes']} |"
        for c in LEGS
    )
    pair_rows = "\n".join(
        f"| {lo}->{hi} | {summary['pairs'][f'{lo}->{hi}']['efficiency']} | "
        f"{summary['pairs'][f'{lo}->{hi}']['host_ceiling_efficiency']} | "
        f"{summary['pairs'][f'{lo}->{hi}']['host_bandwidth_efficiency']} | "
        f"{summary['pairs'][f'{lo}->{hi}']['normalized']} |"
        for lo, hi in pairs
    )
    stages = legs[LEGS[-1]]["stage_times"]
    stage_rows = "\n".join(
        f"| {k} | " + " | ".join(str(legs[c]['stage_times'].get(k, '-')) for c in LEGS) + " |"
        for k in stages
    )
    stage_hdr = " | ".join(f"local[{c}]" for c in LEGS)
    md = f"""# BENCH baseline — scaling evidence (N vs 4N)

Same input ({DOCS:,}-doc deterministic synth corpus materialized ONCE to
parquet and read by every leg — the production source shape), same
config; {RUNS} fresh subprocesses per leg, median wall of the MEASURED
run after {summary['warmup_runs']} untimed warmup pipeline(s) per
subprocess (steady state: JIT, page cache, pre-forked Python workers —
cold-start is amortized over hours on a real cluster and 32 concurrent
cold Python workers alone were measured adding ~15s to the first
Arrow-UDF stage). `local[N]` levels stand in for executor counts (no
real cluster in this sandbox; see BASELINE.md). Every run is gated on the host-health probe
(`BENCH/host_probe.py`, healthy < {HEALTHY_SEC}s) because this VM's memory
subsystem intermittently degrades ~75x; the probe value before each run
is recorded.

| parallelism | wall median (s) | docs/sec | walls | probes |
|---|---|---|---|---|
{rows}

**Scaling efficiency** = throughput(4N) / (4 x throughput(N)), reported
next to TWO host ceilings measured with the same warm-pool 3-median
protocol (no Spark): `cpu ceiling` = pure-CPU hashlib loop (cache
resident), `bw ceiling` = DRAM copy bandwidth (np.copyto, pre-touched).
On this VM the memory bus saturates near 8 workers (bw 8->32 ~0.22), so
the shuffle/string-heavy fraction of ANY engine cannot scale past ~8
local threads — a real cluster adds a memory bus per node, local threads
do not. The engine's workload mixes both regimes; its achievable ceiling
lies between the two columns. `normalized` = engine / cpu ceiling.

| pair | engine efficiency | cpu ceiling | bw ceiling | normalized |
|---|---|---|---|---|
{pair_rows}

Target >= 0.8 (north rule).

Per-stage wall seconds (median-representative run):

| stage | {stage_hdr} |
|---|{'---|' * len(LEGS)}
{stage_rows}

Raw: `{json.dumps(summary)}`

## Measurement caveats (single shared VM)

Host ceiling: pure-CPU multiprocessing (hashlib loop, warm pools,
3-median) — the same protocol as the engine legs. The structural scale
analysis (what shuffles, what stays JVM-side, how hot keys are bounded)
is in README.md and NOTES.md.
"""
    out_name = os.environ.get("BASELINE_OUT", os.path.join("BENCH", "BASELINE.md"))
    with open(os.path.join(REPO, out_name), "w") as f:
        f.write(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
