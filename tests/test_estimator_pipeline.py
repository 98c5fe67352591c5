"""Estimator integration: the full pipeline under each estimator mode,
verifying survivor-count semantics end-to-end (reference pass 3,
``lib/markdup_sam.py:179-193``)."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.plans.pipeline import DedupPipeline
from umi_dedup_spark.synth import make_pages


@pytest.fixture(scope="module")
def corpus(spark):
    return make_pages(n_docs=150, seed=21)


@pytest.mark.parametrize("algo", ["weighted_average", "weighted_average2", "cluster"])
def test_estimator_modes_run_and_bound_survivors(spark, corpus, algo):
    cfg = dataclasses.replace(
        DedupConfig(shuffle_partitions=8), algorithm=algo, keyspace_size=2**16
    )
    res = DedupPipeline(spark, cfg).run(corpus.to_spark(spark))
    marked = res.marked
    n = marked.count()
    survivors = marked.filter(~F.col("is_duplicate")).count()
    # clamp invariant per cluster: naive <= survivors <= total
    n_clusters = marked.select("cluster_id").distinct().count()
    n_families = marked.select("norm_hash").distinct().count()
    assert n_clusters <= survivors <= n, (algo, n_clusters, survivors, n)
    # per-family survivor cap: never keep more than the family has docs
    per_fam = (
        marked.groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.sum((~F.col("is_duplicate")).cast("long")).alias("kept"),
        )
        .filter(F.col("kept") > F.col("sz"))
        .count()
    )
    assert per_fam == 0
    # every family with >= 1 doc in a cluster still has its rows present
    assert marked.count() == n


def test_naive_keeps_exactly_one_per_cluster(spark, corpus):
    cfg = DedupConfig(shuffle_partitions=8)
    res = DedupPipeline(spark, cfg).run(corpus.to_spark(spark))
    bad = (
        res.marked.groupBy("cluster_id")
        .agg(F.sum((~F.col("is_duplicate")).cast("long")).alias("kept"))
        .filter(F.col("kept") != 1)
        .count()
    )
    assert bad == 0
