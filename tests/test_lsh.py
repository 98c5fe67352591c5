"""LSH banding + candidate-pair tests: band determinism, all-pairs vs
star+chain cap behavior, overflow surfacing (no silent truncation)."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.functions.hashing import make_fingerprint_udf
from umi_dedup_spark.operators.lsh import add_band_hashes, candidate_pairs
from umi_dedup_spark.plans.pipeline import DedupPipeline
from umi_dedup_spark.synth import make_pages


def _fams(spark, texts, counts=None):
    rows = [
        (i, (counts or {}).get(i, 1), i, t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "norm_hash long, fam_count long, fam_tb long, norm_text string"
    )
    cfg = DedupConfig()
    fp = make_fingerprint_udf(cfg.shingle_k, cfg.num_perm, cfg.seed)
    return df.withColumn("fp", fp("norm_text")).select(
        "norm_hash", "fam_count", "fam_tb", "norm_text",
        F.col("fp.minhash").alias("minhash"), F.col("fp.simhash").alias("simhash"),
    )


def test_identical_text_shares_all_bands(spark):
    fams = _fams(spark, ["alpha beta gamma delta epsilon zeta " * 10] * 2)
    cfg = DedupConfig()
    banded = add_band_hashes(fams, cfg)
    # both families land in the same bucket for every band
    n_buckets = banded.groupBy("band_id", "band_hash").count().filter("count = 2").count()
    assert n_buckets == cfg.lsh_bands
    pairs, overflow = candidate_pairs(banded, cfg)
    assert pairs.count() == 1
    assert overflow.count() == 0


def test_hot_bucket_star_chain_and_overflow(spark):
    # one boilerplate bucket larger than the cap -> star+chain linking,
    # overflow row surfaced, connectivity preserved end-to-end
    n_hot = 40
    cfg = dataclasses.replace(DedupConfig(), max_bucket_families=16)
    base = "page not found error the requested resource is gone " * 6
    texts = [f"{base} unique tail {i}" for i in range(n_hot)]
    fams = _fams(spark, texts)
    banded = add_band_hashes(fams, cfg)
    pairs, overflow = candidate_pairs(banded, cfg)
    n_over = overflow.count()
    assert n_over > 0, "oversized bucket must be surfaced"
    np = pairs.count()
    # star+chain is O(m) per hot bucket, not O(m^2)
    assert np < n_hot * n_hot / 2
    # connectivity: union-find over emitted pairs joins all hot families
    parent = list(range(n_hot))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        a, b = find(int(r["src"])), find(int(r["dst"]))
        if a != b:
            parent[a] = b
    roots = {find(i) for i in range(n_hot)}
    assert len(roots) == 1, f"hot bucket fragmented into {len(roots)} components"


def test_pipeline_hot_band_single_cluster(spark):
    cfg = dataclasses.replace(DedupConfig(shuffle_partitions=8), max_bucket_families=8)
    corpus = make_pages(n_docs=40, seed=11, hot_band_size=30)
    res = DedupPipeline(spark, cfg).run(corpus.to_spark(spark))
    hot_urls = [u for u, k in corpus.truth.items() if k == "hot0"]
    rows = res.marked.filter(F.col("url").isin(hot_urls)).select("cluster_id").collect()
    assert len({r["cluster_id"] for r in rows}) == 1
