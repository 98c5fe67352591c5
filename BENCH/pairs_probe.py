#!/usr/bin/env python
"""A/B the pairs-stage plan shape on one banded input, same session.

old  — the shipped shape: ONE full exchange+sort of the banded table,
       persist, count window for bucket_size, self-join + star/chain.
new  — prune-first: hash-agg bucket sizes (map-side combine), keep only
       buckets >= 2, (broadcast-)join the size back onto banded, then
       exchange+sort+persist ONLY the surviving rows; the count window
       disappears (size arrives on the join).

Both produce identical (src, dst, is_substring) sets and identical
overflow rows; the probe asserts it.

Usage: python BENCH/pairs_probe.py [docs] [cpus] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from umi_dedup_spark import DedupConfig
from umi_dedup_spark.functions.hashing import make_fingerprint_udf
from umi_dedup_spark.operators.exact import exact_families, prepare_docs
from umi_dedup_spark.operators.lsh import add_band_hashes
from umi_dedup_spark.operators.suffix import window_band_rows
from umi_dedup_spark.session import get_spark
from umi_dedup_spark.synth import make_pages

DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

BUCKET = ["band_id", "band_hash"]
ORDER = ["band_id", "band_hash"]


def _sorted(df, parts):
    return df.repartition(*BUCKET).sortWithinPartitions(
        "band_id", "band_hash", F.desc("fam_count"), F.asc("fam_tb"), F.asc("norm_hash")
    )


def _emit(sized, cap):
    small = sized.filter((F.col("bucket_size") >= 2) & (F.col("bucket_size") <= cap))
    a = small.select(*BUCKET, F.col("norm_hash").alias("src"), "is_substring")
    b = small.select(*BUCKET, F.col("norm_hash").alias("dst"))
    small_pairs = (
        a.join(b, BUCKET).filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "is_substring")
    )
    big = sized.filter(F.col("bucket_size") > cap)
    w = Window.partitionBy(*BUCKET).orderBy(
        F.desc("fam_count"), F.asc("fam_tb"), F.asc("norm_hash")
    )
    ranked = big.withColumn("rn", F.row_number().over(w))
    top = ranked.filter(F.col("rn") == 1).select(*BUCKET, F.col("norm_hash").alias("hub"))
    star = ranked.filter(F.col("rn") > 1).join(top, BUCKET).select(
        F.col("hub").alias("src"), F.col("norm_hash").alias("dst"), "is_substring")
    chain = (ranked.withColumn("nxt", F.lead("norm_hash").over(w))
             .filter(F.col("nxt").isNotNull())
             .select(F.col("norm_hash").alias("src"), F.col("nxt").alias("dst"), "is_substring"))
    big_pairs = star.unionByName(chain).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"),
        "is_substring").filter(F.col("src") != F.col("dst"))
    return small_pairs.unionByName(big_pairs).groupBy("src", "dst").agg(
        F.max("is_substring").alias("is_substring"))


def run_old(banded, cap, parts):
    sb = _sorted(banded, parts).persist()
    wb = Window.partitionBy(*BUCKET)
    sized = sb.withColumn("bucket_size", F.count(F.lit(1)).over(wb))
    pairs = _emit(sized, cap)
    n = pairs.count()
    over = sized.filter(F.col("bucket_size") > cap).groupBy(*BUCKET).agg(
        F.max("bucket_size").alias("bucket_size")).count()
    sb.unpersist()
    return n, over


def run_new(banded, cap, parts):
    sizes = (banded.groupBy(*BUCKET).agg(F.count(F.lit(1)).alias("bucket_size"))
             .filter(F.col("bucket_size") >= 2)).persist()
    n_dup = sizes.count()
    side = F.broadcast(sizes) if n_dup <= 5_000_000 else sizes
    sized = _sorted(banded.join(side, BUCKET), parts).persist()
    pairs = _emit(sized, cap)
    n = pairs.count()
    over = sizes.filter(F.col("bucket_size") > cap).count()
    sizes.unpersist(); sized.unpersist()
    return n, over


def main():
    spark = get_spark("pairs-probe", parallelism=CPUS, shuffle_partitions=max(CPUS, 8))
    cfg = DedupConfig()
    corpus_dir = os.environ.get("PAIRS_PROBE_CORPUS")
    if corpus_dir:
        pages = spark.read.parquet(corpus_dir)
    else:
        pages = make_pages(n_docs=DOCS, seed=42, hot_band_size=40).to_spark(spark)
    docs_full = prepare_docs(pages, cfg)
    fp_udf = make_fingerprint_udf(cfg.shingle_k, cfg.num_perm, cfg.seed,
        cfg.substring_window_tokens, cfg.substring_anchor_stride,
        cfg.fingerprint_max_tokens)
    fams = (exact_families(docs_full, cfg).withColumn("fp", fp_udf(F.col("norm_text")))
        .select("norm_hash", "fam_count", "fam_tb",
                F.col("fp.minhash").alias("minhash"),
                F.col("fp.win_hashes").alias("win_hashes"))).localCheckpoint()
    banded = add_band_hashes(fams, cfg).unionByName(window_band_rows(fams))
    cap = cfg.max_bucket_families
    parts = max(CPUS, 8)

    results = {}
    for rep in range(REPS):
        for name, fn in (("old", run_old), ("new", run_new)):
            t0 = time.time()
            n, over = fn(banded, cap, parts)
            w = time.time() - t0
            results.setdefault(name, []).append(w)
            print({"rep": rep, "variant": name, "wall": round(w, 2),
                   "pairs": n, "overflow": over}, flush=True)
    import statistics
    print({"docs": DOCS, "cpus": CPUS,
           "medians": {k: round(statistics.median(v), 2) for k, v in results.items()},
           "mins": {k: round(min(v), 2) for k, v in results.items()}}, flush=True)


if __name__ == "__main__":
    main()
