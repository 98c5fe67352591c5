#!/usr/bin/env python
"""Families-stage decomposition probe at 1M synth docs (VERDICT r4 #4).

Variants (each forced end-to-end with an aggregate that consumes every
fingerprint column — a bare count() would let Catalyst prune the UDF):

  aggfirst  — current pipeline shape: groupBy(norm_hash).agg(first(norm_text))
              shuffles the TEXT, then the Arrow UDF runs per FAMILY.
  mapside   — Arrow UDF per DOC before any shuffle (no text ever shuffles),
              then a narrow agg (first(fp) is safe: all members share
              norm_text, hence identical fingerprints).
  aggonly   — the narrow agg alone (no text, no UDF): agg lower bound.
  udfonly   — the per-doc UDF alone (no shuffle): kernel lower bound.

Usage: python BENCH/families_probe.py [cpus] [corpus_dir] [variants,csv]
"""

from __future__ import annotations

import os
import sys
import time

cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
corpus = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.spark-local/synth_corpus_1000000"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.functions.hashing import make_fingerprint_udf
from umi_dedup_spark.functions.text import normalize_text
from umi_dedup_spark.operators.exact import exact_families, prepare_docs
from umi_dedup_spark.session import get_spark, warm_python_workers

n = int(cpus)
spark = get_spark("families-probe", parallelism=n, shuffle_partitions=max(n, 8))
warm_python_workers(spark)
cfg = DedupConfig()
pages = spark.read.parquet(corpus)
docs_full = prepare_docs(pages, cfg)
fp_udf = make_fingerprint_udf(
    cfg.shingle_k, cfg.num_perm, cfg.seed,
    cfg.substring_window_tokens, cfg.substring_anchor_stride,
)
norm = normalize_text(F.col("text"), cfg.lowercase, cfg.collapse_whitespace)

FORCE = [
    F.sum("fam_count").alias("s1"),
    F.sum(F.col("simhash") % 997).alias("s2"),
    F.sum(F.size("minhash")).alias("s3"),
    F.sum(F.size("win_hashes")).alias("s4"),
]


def fams_aggfirst():
    return (
        exact_families(docs_full, cfg)
        .withColumn("fp", fp_udf(F.col("norm_text")))
        .select("norm_hash", "fam_count", "fam_tb",
                F.col("fp.minhash").alias("minhash"),
                F.col("fp.simhash").alias("simhash"),
                F.col("fp.win_hashes").alias("win_hashes"))
    )


def fams_mapside():
    per_doc = docs_full.withColumn("fp", fp_udf(norm))
    return per_doc.groupBy("norm_hash").agg(
        F.count(F.lit(1)).alias("fam_count"),
        F.min("doc_key").alias("fam_tb"),
        F.first("fp.minhash").alias("minhash"),
        F.first("fp.simhash").alias("simhash"),
        F.first("fp.win_hashes").alias("win_hashes"),
    )


VARIANTS = {
    "aggfirst": lambda: fams_aggfirst().agg(*FORCE).collect(),
    "mapside": lambda: fams_mapside().agg(*FORCE).collect(),
    "aggonly": lambda: docs_full.groupBy("norm_hash").agg(
        F.count(F.lit(1)).alias("fam_count"), F.min("doc_key").alias("fam_tb")
    ).agg(F.sum("fam_count"), F.sum(F.col("fam_tb") % 997)).collect(),
    "udfonly": lambda: docs_full.select(fp_udf(norm).alias("fp")).agg(
        F.sum(F.col("fp.simhash") % 997), F.sum(F.size("fp.minhash"))
    ).collect(),
}

# the variants argument is an ORDERED sequence (repeats allowed):
# interleave reps, e.g. "aggfirst,mapside,aggfirst,mapside" — this host's
# throughput varies ~3x between windows, so only within-session
# interleaved ratios are comparable
seq = only if only else list(VARIANTS)
for name in seq:
    t0 = time.time()
    out = VARIANTS[name]()
    print(f"{name}@{cpus}: {round(time.time() - t0, 1)}s  {out[0][0]}", flush=True)
