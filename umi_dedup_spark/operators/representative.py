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
    """C5: representative family per cluster — max fam_count, tie min fam_tb.

    Rank-1 as a ``min(struct(...))`` aggregation (map-side combine, no
    single-task sort over a hot cluster): the ordering key (-fam_count,
    fam_tb, norm_hash) is total (norm_hash unique), so appending the
    payload fields to the struct cannot change the comparison.
    """
    best = F.min(
        F.struct(
            (-F.col("fam_count")).alias("nc"),
            F.col("fam_tb").alias("tb"),
            F.col("norm_hash").alias("nh"),
            F.col("fam_count").alias("cnt"),
        )
    ).alias("best")
    return clustered_fams.groupBy("cluster_id").agg(best).select(
        "cluster_id",
        F.col("best.nh").alias("rep_norm_hash"),
        F.col("best.cnt").alias("rep_fam_count"),
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

    The rank-1 case (n_keep_col=None) is a skew-safe agg+join — a hot
    cluster never becomes one sorting task. The n_keep>1 estimator path
    keeps a row_number window, but partitioned per *family* where members
    share identical norm_text (hence identical quality), bounding the sort
    to one family.
    """
    if n_keep_col is None:
        surv = docs_with_cluster.groupBy(*partition_cols).agg(
            F.min(
                F.struct(
                    (-F.col("quality")).alias("nq"), F.col("doc_key").alias("dk")
                )
            ).alias("best")
        ).select(*partition_cols, F.col("best.dk").alias("_surv_key"))
        return (
            docs_with_cluster.join(surv, list(partition_cols))
            .withColumn("is_duplicate", F.col("doc_key") != F.col("_surv_key"))
            .drop("_surv_key")
        )
    w = Window.partitionBy(*partition_cols).orderBy(F.desc("quality"), F.asc("doc_key"))
    ranked = docs_with_cluster.withColumn("dup_rank", F.row_number().over(w))
    return ranked.withColumn("is_duplicate", F.col("dup_rank") > F.col(n_keep_col))


def mark_survivors_and_rep(
    docs_with_cluster: DataFrame,
    partition_cols: tuple[str, ...] = ("cluster_id",),
) -> DataFrame:
    """Fused naive path: in the 1-survivor-per-cluster rule the survivor
    IS the representative, so ONE ``min(struct(-quality, doc_key, url))``
    aggregation + ONE join back produces both ``is_duplicate`` and
    ``rep_url`` — `mark_survivors` followed by `attach_rep_url` computes
    the identical row twice ((−quality, doc_key) is already a total order,
    appending url cannot change the min). Halves the agg+join count of
    the marked stage, whose cost is scheduling-bound fixed overhead that
    Amdahl-limits N→4N scaling.
    """
    surv = docs_with_cluster.groupBy(*partition_cols).agg(
        F.min(
            F.struct(
                (-F.col("quality")).alias("nq"),
                F.col("doc_key").alias("dk"),
                F.col("url").alias("u"),
            )
        ).alias("best")
    )
    return (
        docs_with_cluster.join(surv, list(partition_cols))
        .withColumn("is_duplicate", F.col("doc_key") != F.col("best.dk"))
        .withColumn("rep_url", F.col("best.u"))
        .drop("best")
    )


def attach_rep_url(marked: DataFrame) -> DataFrame:
    """Broadcast-style map-back: every doc gets the url of its cluster's
    surviving representative (best (quality desc, doc_key asc) among the
    non-duplicates). Rank-1 via ``min_by``-style struct aggregation —
    map-side combine, no window sort over a hot cluster; the agg output is
    <= one row per cluster, so Catalyst/AQE broadcasts the join when it
    fits."""
    reps = (
        marked.filter(~F.col("is_duplicate"))
        .groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("quality")).alias("nq"),
                    F.col("doc_key").alias("dk"),
                    F.col("url").alias("u"),
                )
            ).alias("best")
        )
        .select("cluster_id", F.col("best.u").alias("rep_url"))
    )
    return marked.join(reps, "cluster_id", "left")
