"""Directional edge construction — the reference's core clustering predicate
re-expressed over candidate pairs.

Reference semantics (``lib/sequence_error.py:47-53``): directed edge
a -> b iff hamming(a, b) == threshold AND count[a] >= 2*count[b] - 1.
Graft (documented divergence, SURVEY.md §2.5 C1): the distance test is
``bit_count(simhash_a ^ simhash_b) <= threshold`` over 64-bit SimHash
fingerprints (a Hamming *ball*, since text perturbations move a variable
number of bits); the count predicate is applied directionally, verbatim.
Substring-pass pairs (shared >= window-length verbatim run) bypass the
SimHash distance test — they carry their own proof of near-duplication —
but still respect the directional count rule.

All predicates are JVM-side whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.functions.hashing import hamming64, minhash_jaccard


def attach_pair_attrs(pairs: DataFrame, fams: DataFrame) -> DataFrame:
    """Join family attributes (simhash, count, tie-break) onto both pair
    sides. fams is the (much smaller) family table — broadcast when small;
    left to Catalyst/AQE otherwise.
    """
    attrs = fams.select(
        F.col("norm_hash").alias("fam"),
        F.col("simhash"),
        F.col("minhash"),
        F.col("fam_count"),
        F.col("fam_tb"),
    )
    a = attrs.select(
        F.col("fam").alias("src"),
        F.col("simhash").alias("simhash_a"),
        F.col("minhash").alias("minhash_a"),
        F.col("fam_count").alias("count_a"),
        F.col("fam_tb").alias("tb_a"),
    )
    b = attrs.select(
        F.col("fam").alias("dst"),
        F.col("simhash").alias("simhash_b"),
        F.col("minhash").alias("minhash_b"),
        F.col("fam_count").alias("count_b"),
        F.col("fam_tb").alias("tb_b"),
    )
    return pairs.join(a, "src").join(b, "dst")


def directed_edges(pairs_with_attrs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Filter near-duplicate pairs and emit directed edges.

    Input: canonical pairs with attrs and an ``is_substring`` flag column.
    Output: (src, dst) directed — src passes the count predicate toward dst.
    A pair yields 0, 1 or 2 directed edges; 0 means the two families stay
    separate (exactly as in the reference, where no adjacency entry forms).
    """
    near = pairs_with_attrs.filter(
        F.col("is_substring")
        | (hamming64(F.col("simhash_a"), F.col("simhash_b")) <= cfg.hamming_threshold)
        | (
            minhash_jaccard(F.col("minhash_a"), F.col("minhash_b"))
            >= cfg.jaccard_threshold
        )
    )
    fwd = near.filter(F.col("count_a") >= 2 * F.col("count_b") - 1).select(
        F.col("src"), F.col("dst")
    )
    rev = near.filter(F.col("count_b") >= 2 * F.col("count_a") - 1).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return fwd.unionByName(rev)
