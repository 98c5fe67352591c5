#!/usr/bin/env python
"""Resume-from-checkpoint evidence at bench scale (VERDICT r3 #7).

test_resume proves the mechanism at toy scale; this measures it at 200k
docs with real file sizes:

  1. full run with checkpointing -> every stage snapshot + manifest
  2. simulate a failure AFTER the pairs stage: delete the manifests of
     every later stage (labels/clusters/marked and pairs_overflow stays —
     it is written with the pairs stage)
  3. resume run -> docs/families/pairs must restore from parquet
     (seconds) while the cluster/mark stages recompute

Prints per-stage wall times for both runs plus the headline skip ratio.
Usage: python BENCH/resume_evidence.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.plans.pipeline import DedupPipeline
from umi_dedup_spark.session import get_spark, warm_python_workers

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, ".spark-local", f"resume_evidence_{N_DOCS}")
CORPUS = os.path.join(REPO, ".spark-local", f"synth_corpus_{N_DOCS}")

# stages whose checkpoints survive the simulated failure
KEEP = {"docs", "families", "pairs", "pairs_overflow"}


def run(spark, resume: bool) -> dict:
    pages = spark.read.parquet(CORPUS)
    pipe = DedupPipeline(spark, DedupConfig(), checkpoint_dir=CKPT)
    t0 = time.time()
    res = pipe.run(pages, resume=resume)
    n = res.marked.count()
    return {
        "resume": resume, "rows": n,
        "wall": round(time.time() - t0, 1),
        "stage_times": res.stage_times,
    }


def main() -> None:
    spark = get_spark("resume-evidence", parallelism=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    warm_python_workers(spark)
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        from umi_dedup_spark.synth import spark_synth_pages

        spark_synth_pages(spark, N_DOCS).write.mode("overwrite").parquet(CORPUS)
    shutil.rmtree(CKPT, ignore_errors=True)

    full = run(spark, resume=False)
    print(json.dumps(full), flush=True)

    # simulated failure after the pairs stage
    for stage in os.listdir(CKPT):
        if stage not in KEEP:
            shutil.rmtree(os.path.join(CKPT, stage), ignore_errors=True)
    spark.catalog.clearCache()

    resumed = run(spark, resume=True)
    print(json.dumps(resumed), flush=True)

    pre = ["docs", "families", "pairs"]
    saved = {s: (full["stage_times"][s], resumed["stage_times"][s]) for s in pre}
    print(json.dumps({
        "n_docs": N_DOCS, "cpus": CPUS,
        "full_wall": full["wall"], "resumed_wall": resumed["wall"],
        "pre_pairs_stage_sec_full_vs_resumed": saved,
        "pre_pairs_saved_sec": round(
            sum(v[0] for v in saved.values()) - sum(v[1] for v in saved.values()), 1
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
