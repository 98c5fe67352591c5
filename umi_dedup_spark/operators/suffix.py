"""Substring ("suffix-array") pass — catches long verbatim overlaps that
shingle-level MinHash dilutes (north-rule requirement).

Analog in the reference: the optical-duplicate detector
(``lib/optical_duplicates.py``) — an orthogonal second duplicate signal
merged into the main pass. Here: every document emits hashes of
fixed-width character windows at a fixed stride over the normalized text;
two documents sharing any window hash provably share a verbatim substring
of >= window length (window equality *is* the proof — no verification
rescan needed). Buckets by window hash feed the same capped pair emission
as the LSH pass.

A numpy suffix-array longest-common-substring checker
(:func:`suffix_array_lcs`) backs the property tests and is available for
optional in-pipeline verification of borderline pairs.

All window hashing is JVM-side (sequence/transform/xxhash64/explode).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.operators.lsh import candidate_pairs


# band_id marking substring-window buckets when unioned with LSH bands
SUBSTRING_BAND_ID = 1_000_000


def _sliding_ext(arr, s: int, backward: bool = False, use_max: bool = False):
    """min (or max) over the s-length window starting (forward) or ending
    (backward) at each position, by doubling: O(log s) whole-array passes
    (concat/slice/zip_with) — NO per-position lambda slices (an
    argmin-per-window formulation allocates O(n*s) structs per row and was
    measured ~10x slower). Truncated edge windows pad with the identity
    element (+inf for min, -inf for max)."""
    pad = -(1 << 63) if use_max else (1 << 63) - 1
    comb = F.greatest if use_max else F.least
    m = arr
    w = 1
    while w < s:
        step = min(w, s - w)
        if backward:
            shifted = F.concat(
                F.array_repeat(F.lit(pad), step),
                F.slice(m, 1, F.greatest(F.size(m) - step, F.lit(0))),
            )
        else:
            shifted = F.concat(
                F.slice(m, step + 1, F.greatest(F.size(m) - step, F.lit(1))),
                F.array_repeat(F.lit(pad), step),
            )
        m = F.zip_with(m, shifted, lambda a_, b_: comb(a_, b_))
        w += step
    return m


def with_window_hashes(
    df: DataFrame, cfg: DedupConfig, text_col: str = "norm_text",
    out_col: str = "win_hashes",
) -> DataFrame:
    """Append ``out_col``: array of content-anchored long-window hashes
    (empty for docs shorter than the window). All other columns pass
    through, so the pipeline computes window hashes in the same projection
    as the MinHash/SimHash fingerprints — one pass over the text, no
    second text-sized exchange.

    Shift-invariance matters: two documents share the verbatim run at
    *different* offsets, so absolute-stride chunking never lines up.
    Anchor selection is TRUE WINNOWING (Schleimer et al. 2003): position i
    anchors iff its token hash is the minimum of at least one s-length
    window covering i. Computed in two sliding-extremum passes:
    fwd[j] = min(th[j..j+s-1]), then anchor(i) iff
    max(fwd[i-s+1..i]) == th[i] — every window covering i has
    fwd[j] <= th[i], so SOME covering window attains th[i] (i.e. i is
    that window's argmin) exactly when the max does. With (effectively)
    distinct 64-bit hashes this selects exactly the per-window argmins, so
    EVERY s consecutive positions contain >= 1 anchor — deterministic,
    content cannot suppress anchors (a plain hash%s==0 rule finds NO
    anchor in low-diversity boilerplate; a forward-min-only rule finds
    none in a decreasing-hash run). A shared verbatim run of >= s+T
    tokens therefore always produces a shared window hash.

    Expected anchors per doc ~ 2*n_tokens/s (winnowing density).
    All JVM-side (split/transform/zip_with/xxhash64).

    Implementation note: the token array and per-token hashes are
    materialized as real columns (staged selects) before any per-position
    lambda touches them — referencing split(...) inside lambda bodies
    makes Catalyst re-evaluate the split per array element, O(n_tokens^2)
    string work per document (measured 89s for a 500k-doc stage).
    CollapseProject would re-inline the expressions through stacked
    selects; the nondeterministic `_b*` columns are deliberate collapse
    barriers.
    """
    T, s = cfg.substring_window_tokens, cfg.substring_anchor_stride
    toked = df.select(
        "*",
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_tk"),
        F.rand(42).alias("_b1"),
    )
    hashed = toked.select(
        "*",
        F.transform(F.col("_tk"), lambda t: F.xxhash64(t)).alias("_th"),
        F.rand(43).alias("_b2"),
    )
    fwd = _sliding_ext(F.col("_th"), s, backward=False)
    minned = hashed.select("*", fwd.alias("_fwd"), F.rand(44).alias("_b3"))
    # anchor(i) iff th[i] == max over the s fwd-window minima ending at i,
    # i.e. th[i] is the min of SOME s-window covering i (exact winnowing)
    cover = _sliding_ext(F.col("_fwd"), s, backward=True, use_max=True)
    covered = minned.select("*", cover.alias("_cov"), F.rand(45).alias("_b4"))
    is_anchor = F.zip_with(
        F.col("_th"), F.col("_cov"), lambda a_, b_: (a_ == b_).cast("int")
    )
    anchors = F.filter(
        F.transform(
            is_anchor, lambda e, i: F.when(e == 1, i + 1).otherwise(F.lit(-1))
        ),
        lambda x: (x > 0) & (x <= F.size(F.col("_tk")) - (T - 1)),
    )
    anchored = covered.select(
        "*", anchors.alias("_anchors"), F.rand(46).alias("_b5")
    )
    wins = F.when(
        F.size(F.col("_tk")) >= T,
        F.transform(
            F.col("_anchors"),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("_tk"), i, T))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return anchored.select("*", wins.alias(out_col)).drop(
        "_tk", "_th", "_fwd", "_cov", "_anchors", "_b1", "_b2", "_b3", "_b4", "_b5"
    )


def add_window_hashes(fams: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode families into content-anchored long-window hash bucket rows
    (band_id, band_hash) — schema-compatible with the LSH band rows so the
    two flows share one bucket exchange.

    The window ordinal is not a meaningful bucket axis (unlike the LSH
    band id): bucketing is purely by content hash so equal windows at
    different ordinals still collide; the constant SUBSTRING_BAND_ID marks
    the rows (and proves the pair — see ``is_substring``).
    """
    withw = with_window_hashes(fams, cfg)
    return withw.select(
        "norm_hash",
        "fam_count",
        "fam_tb",
        F.explode(F.col("win_hashes")).alias("band_hash"),
    ).select(
        "norm_hash",
        "fam_count",
        "fam_tb",
        F.lit(SUBSTRING_BAND_ID).alias("band_id"),
        "band_hash",
        F.lit(True).alias("is_substring"),
    )


def substring_pairs(fams: DataFrame, cfg: DedupConfig) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs from shared verbatim windows (+ overflow metrics)."""
    return candidate_pairs(add_window_hashes(fams, cfg), cfg)


def suffix_array_lcs(a: str, b: str) -> int:
    """Length of the longest common substring of a and b, via a numpy
    suffix array (argsort of suffix ranks, prefix-doubling) over the
    concatenation — O(n log^2 n). Used by tests to certify that
    window-hash pairs really share >= window-length verbatim runs.
    """
    sep = "\x00"
    s = a + sep + b
    n = len(s)
    if n == 1:
        return 0
    arr = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    rank = np.unique(arr, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        pair = np.stack([rank[order], key2[order]], axis=1)
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.any(np.diff(pair, axis=0) != 0, axis=1)
        ranks_sorted = np.concatenate([[0], np.cumsum(changed)])
        new_rank[order] = ranks_sorted
        rank = new_rank
        if rank.max() == n - 1:
            break
        k *= 2
    sa = np.argsort(rank, kind="stable")
    # Kasai LCP
    inv = rank
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        if inv[i] > 0:
            j = sa[inv[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h] and s[i + h] != sep:
                h += 1
            lcp[inv[i]] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    # LCS = max lcp between suffixes from different strings
    la = len(a)
    best = 0
    for r in range(1, n):
        i, j = sa[r - 1], sa[r]
        if (i < la) != (j < la):
            best = max(best, int(lcp[r]))
    return best
