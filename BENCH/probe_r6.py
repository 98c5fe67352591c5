#!/usr/bin/env python
"""Round-6 per-query probe: time one declared query at an arbitrary sf
with the bench's cold-lineage protocol (clearCache + persistent-RDD sweep
per rep), and optionally dump .explain('formatted') to a file.

Usage: python BENCH/probe_r6.py <query> [sf_dir] [reps] [explain_out]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from umi_dedup_spark.session import get_spark, warm_python_workers  # noqa: E402

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
explain_out = sys.argv[4] if len(sys.argv) > 4 else None

spark = get_spark("probe-r6", shuffle_partitions=32)
warm_python_workers(spark)
q = entry_mod.queries()[name]

if explain_out:
    df = q(spark, sf_dir)
    with open(explain_out, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print("wrote", explain_out)

walls = []
for _ in range(reps):
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        jmap.get(rid).unpersist(False)
    t0 = time.time()
    n = q(spark, sf_dir).count()
    walls.append(round(time.time() - t0, 3))
print({"query": name, "sf_dir": sf_dir, "rows": n, "walls": walls,
       "min": min(walls)})
