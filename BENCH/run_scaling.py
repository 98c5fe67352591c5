#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: N vs 4N executors).

No multi-node cluster exists in this sandbox, so two local parallelism
levels stand in: the identical synth-dedup workload runs in fresh
subprocesses at SPARK_GRAFT_CPUS=8 and =32 (same input, same config),
and efficiency = throughput(32) / (4 * throughput(8)).

Writes BENCH/BASELINE.md and prints the summary JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SCALING_DOCS", "200000"))


def run_at(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_SYNTH_DOCS=str(DOCS),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), f"synth_dedup_{DOCS // 1000}k"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3000,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    r8 = run_at(8)
    r32 = run_at(32)
    t8 = r8["synth_docs_per_sec"]
    t32 = r32["synth_docs_per_sec"]
    eff = t32 / (4 * t8)
    summary = {
        "docs": DOCS,
        "throughput_local8_docs_per_sec": t8,
        "throughput_local32_docs_per_sec": t32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
    }
    stage8 = r8.get("synth_stage_times", {})
    stage32 = r32.get("synth_stage_times", {})
    md = f"""# BENCH baseline — scaling evidence (N vs 4N)

Same input (JVM-synthesized deterministic corpus, {DOCS:,} docs, seed 42),
same config, fresh subprocess per run. `local[8]` and `local[32]` stand in
for N and 4N executors (no real cluster in this sandbox; see BASELINE.md).

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[8]  | {r8['queries'][f'synth_dedup_{DOCS // 1000}k']} | {t8} |
| local[32] | {r32['queries'][f'synth_dedup_{DOCS // 1000}k']} | {t32} |

**Scaling efficiency** = throughput(32) / (4 x throughput(8)) =
**{eff:.3f}** (target >= 0.8).

Per-stage wall seconds:

| stage | local[8] | local[32] |
|---|---|---|
""" + "\n".join(
        f"| {k} | {stage8.get(k, '-')} | {stage32.get(k, '-')} |" for k in stage8
    ) + f"""

Raw: `{json.dumps(summary)}`

## Measurement caveats (single shared VM)

This sandbox VM's memory subsystem throughput varies by up to ~80x
between measurement windows (a fixed 10M-element numpy int64 multiply
was observed at 0.03s and at 2.5s on an *idle* box hours apart —
hypervisor/neighbor contention). Absolute docs/sec and the 8-vs-32
efficiency ratio are both sensitive to which window a leg lands in;
legs are run back-to-back to minimize skew, but cross-run comparisons
of this file's numbers are only meaningful within one generation stamp.
The structural scale analysis (what shuffles, what stays JVM-side, how
hot keys are bounded) is in README.md and NOTES.md.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
