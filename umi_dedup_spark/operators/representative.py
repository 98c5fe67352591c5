"""Cluster representative selection, relabeling, and survivor marking.

Maps reference semantics:
* C5 ``get_best`` (``lib/sequence_error.py:91-98``): cluster representative
  = highest-count member; reference tie-break is nondeterministic (stable
  sort of a set) — our documented deterministic rule: max count, then min
  fam_tb (min doc_key). With directional edges the seed always wins, but
  the window below re-derives it from membership so the rule is explicit.
* C6/C7 ``reduce_clusters`` + relabel (``lib/sequence_error.py:100-111``,
  ``lib/markdup_sam.py:140-163``): members relabeled to the parent; row
  count conserved (asserted in tests, mirroring ``markdup_sam.py:159``).
* E6 survivor selection (``lib/umi_data.py:137-146``): within each merged
  cluster, the lowest-quality records are the duplicates; we keep the
  ``n_keep`` best (quality desc, doc_key asc) and flag the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_table(fams: DataFrame, labels: DataFrame) -> DataFrame:
    """One row per family with its cluster id; families that never formed
    an edge keep their own norm_hash as cluster_id (C9 single-UMI shortcut:
    buckets with one family produce no pairs, hence label = self)."""
    out = fams.join(labels, fams.norm_hash == labels.fam, "left").drop("fam")
    return out.withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("norm_hash"))
    )


def cluster_representatives(clustered_fams: DataFrame) -> DataFrame:
    """C5: representative family per cluster — max fam_count, tie min fam_tb."""
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("fam_count"), F.asc("fam_tb"), F.asc("norm_hash")
    )
    return (
        clustered_fams.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("norm_hash").alias("rep_norm_hash"),
            F.col("fam_count").alias("rep_fam_count"),
        )
    )


def mark_survivors(
    docs_with_cluster: DataFrame,
    n_keep_col: str | None = None,
    partition_cols: tuple[str, ...] = ("cluster_id",),
) -> DataFrame:
    """E6: within each survivor scope keep the n_keep best (quality desc,
    doc_key asc) docs; flag the rest ``is_duplicate``.

    Scope mapping (documented, SURVEY.md §2.6): ``naive`` keeps 1 per
    *cluster* — the post-relabel merged key, exactly the reference's naive
    estimate applied after ``reduce_clusters``. Histogram estimators
    apportion n_keep per member *family* (partition_cols =
    (cluster_id, norm_hash)), i.e. the bundle = cluster, keys = families.
    """
    w = Window.partitionBy(*partition_cols).orderBy(F.desc("quality"), F.asc("doc_key"))
    ranked = docs_with_cluster.withColumn("dup_rank", F.row_number().over(w))
    keep = F.col(n_keep_col) if n_keep_col else F.lit(1)
    return ranked.withColumn("is_duplicate", F.col("dup_rank") > keep)


def attach_rep_url(marked: DataFrame) -> DataFrame:
    """Broadcast-style map-back: every doc gets the url of its cluster's
    surviving representative (rank-1 doc). Self-join on cluster_id; the
    rank-1 side is tiny (<= one row per cluster) — Catalyst/AQE broadcasts
    it when it fits."""
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_key"))
    reps = (
        marked.filter(~F.col("is_duplicate"))
        .withColumn("rep_rn", F.row_number().over(w))
        .filter(F.col("rep_rn") == 1)
        .select("cluster_id", F.col("url").alias("rep_url"))
    )
    return marked.join(reps, "cluster_id", "left")
