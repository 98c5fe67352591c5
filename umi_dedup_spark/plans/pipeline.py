"""The flagship end-to-end dedup pipeline — graft of the reference's
``dedup.py`` lifecycle (SURVEY.md §3.1) onto Spark stages:

  read pages
    -> usable filter + normalize                (narrow, codegen)
    -> exact-hash family pass                   (shuffle 1: groupBy norm_hash)
    -> MinHash + SimHash fingerprints           (narrow, Arrow pandas UDF,
                                                 one row per *family* — the
                                                 exact pass already collapsed
                                                 identical text)
    -> LSH band explode + substring windows     (narrow)
    -> candidate pairs                          (shuffle 2: bucketed self-join)
    -> directional edges                        (shuffle 3: attr joins)
    -> label-propagation CC fixpoint            (shuffles 4..4+O(diameter))
    -> representative / estimator / survivors   (window + applyInPandas)
    -> map-back join, metrics, lineage          (broadcast-ish join)
    -> write marked corpus + clusters + metrics

Each stage optionally snapshots to a checkpoint table with a manifest;
a rerun resumes from the newest complete snapshot (north-rule requirement;
see tests/test_resume.py). Stage ordering mirrors the reference: the
exact pass (optical analog) runs before the near-dup pass and its
survivors/counts feed the estimator, exactly as
``lib/markdup_sam.py:165-193``.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umi_dedup_spark import io as dio
from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.functions.hashing import make_fingerprint_udf
from umi_dedup_spark.operators.cc import propagate_labels
from umi_dedup_spark.operators.directional import attach_pair_attrs, directed_edges
from umi_dedup_spark.operators.estimators import cluster_survivor_counts
from umi_dedup_spark.operators.exact import (
    exact_families,
    mark_exact_duplicates,
    prepare_docs,
)
from umi_dedup_spark.operators.lsh import add_band_hashes, candidate_pairs
from umi_dedup_spark.operators.representative import (
    attach_rep_url,
    cluster_table,
    mark_survivors,
)
from umi_dedup_spark.operators.stats import (
    category_counts,
    count_histogram,
    library_stats,
    partition_lineage,
)
from umi_dedup_spark.operators.suffix import substring_pairs


@dataclass
class PipelineResult:
    marked: DataFrame
    clusters: DataFrame
    metrics: dict = field(default_factory=dict)
    stage_times: dict = field(default_factory=dict)


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.checkpoint_dir = checkpoint_dir
        self.lineage: list[DataFrame] = []

    # -- checkpoint helpers -------------------------------------------
    def _ckpt_path(self, stage: str) -> str | None:
        if not self.checkpoint_dir:
            return None
        return os.path.join(self.checkpoint_dir, stage)

    def _stage(self, stage: str, df_fn, resume: bool) -> DataFrame:
        """Run (or resume) a stage; snapshot + lineage when checkpointing."""
        path = self._ckpt_path(stage)
        if path and resume and dio.stage_complete(path):
            return dio.read_table(self.spark, path)
        df = df_fn()
        if path:
            dio.write_table(df, path, stage=stage, config=self.cfg)
            df = dio.read_table(self.spark, path)
        else:
            # no durable checkpoint requested: materialize once so
            # downstream stages (and the CC fixpoint loop) never recompute
            # the fingerprint UDFs / LSH joins. persist() uses Spark's
            # compressed columnar cache — measured ~5x faster to build
            # than localCheckpoint's row-oriented block storage; the CC
            # loop still localCheckpoints its (small) label table to cut
            # the iterative lineage.
            df = df.persist()
            df.count()
        self.lineage.append(partition_lineage(df, stage))
        return df

    # -- the plan ------------------------------------------------------
    def run(self, pages: DataFrame, resume: bool = False) -> PipelineResult:
        cfg = self.cfg
        times: dict[str, float] = {}

        def timed(name, fn):
            t0 = time.time()
            out = self._stage(name, fn, resume)
            times[name] = round(time.time() - t0, 3)
            return out

        docs = timed("docs", lambda: prepare_docs(pages, cfg))

        fams = timed(
            "families",
            lambda: exact_families(docs, cfg).withColumn(
                "fp",
                make_fingerprint_udf(cfg.shingle_k, cfg.num_perm, cfg.seed)(
                    F.col("norm_text")
                ),
            )
            .select(
                "norm_hash",
                "fam_count",
                "fam_tb",
                "norm_text",
                F.col("fp.minhash").alias("minhash"),
                F.col("fp.simhash").alias("simhash"),
            ),
        )

        def build_pairs():
            lsh_p, lsh_over = candidate_pairs(add_band_hashes(fams, cfg), cfg)
            sub_p, sub_over = substring_pairs(fams, cfg)
            pairs = (
                lsh_p.withColumn("is_substring", F.lit(False))
                .unionByName(sub_p.withColumn("is_substring", F.lit(True)))
                .groupBy("src", "dst")
                .agg(F.max("is_substring").alias("is_substring"))
            )
            self.metrics_overflow = lsh_over.unionByName(sub_over)
            return pairs

        pairs = timed("pairs", build_pairs)

        edges = timed(
            "edges",
            lambda: directed_edges(attach_pair_attrs(pairs, fams), cfg),
        )

        def build_labels():
            # fixpoint working set = families touched by >= 1 edge only;
            # untouched families (the vast majority of a web corpus) never
            # enter the loop — cluster_table() self-assigns them (C9
            # single-UMI shortcut, reference lib/sequence_error.py:131-132)
            touched = (
                edges.select(F.col("src").alias("fam"))
                .unionByName(edges.select(F.col("dst").alias("fam")))
                .distinct()
            )
            nodes = fams.select(
                F.col("norm_hash").alias("fam"), "fam_count", "fam_tb"
            ).join(touched, "fam", "left_semi")
            labels, iters = propagate_labels(nodes, edges, cfg.cc_max_iters)
            self.cc_iterations = iters
            return labels

        labels = timed("labels", build_labels)

        clustered = timed("clusters", lambda: cluster_table(fams, labels))

        def build_marked():
            docs_exact = mark_exact_duplicates(docs)
            doc_clusters = docs_exact.join(
                clustered.select("norm_hash", "cluster_id"), "norm_hash"
            )
            if cfg.algorithm == "naive":
                marked = mark_survivors(doc_clusters)  # 1 per merged cluster key
            else:
                n_keep = cluster_survivor_counts(
                    clustered, cfg.algorithm, cfg.keyspace_size, cfg.kmax
                ).select("norm_hash", "n_keep")
                marked = mark_survivors(
                    doc_clusters.join(n_keep, "norm_hash"),
                    "n_keep",
                    partition_cols=("cluster_id", "norm_hash"),
                )
            return attach_rep_url(marked).drop("norm_text")

        marked = timed("marked", build_marked)

        result = PipelineResult(marked=marked, clusters=clustered, stage_times=times)
        return result

    # -- reports (materialize on demand) --------------------------------
    def summary(self, result: PipelineResult) -> dict:
        cats = {
            r["category"]: r["n"] for r in category_counts(result.marked).collect()
        }
        lib = library_stats(result.marked)
        hist = count_histogram(result.clusters).collect()
        out = {
            "categories": cats,
            "library": lib,
            "count_histogram": [(r["count_value"], r["n_keys"]) for r in hist],
            "cc_iterations": getattr(self, "cc_iterations", None),
            "stage_times": result.stage_times,
        }
        result.metrics = out
        return out
