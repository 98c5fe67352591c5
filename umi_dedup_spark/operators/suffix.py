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


def add_window_hashes(fams: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode families into content-anchored long-window hashes.

    Shift-invariance matters: two documents share the verbatim run at
    *different* offsets, so absolute-stride chunking never lines up.
    Instead, windows are ``window_tokens``-token shingles **anchored by
    content**: a shingle is emitted iff the hash of its first token is
    ``0 mod anchor_stride`` (winnowing-style sampling). Identical verbatim
    runs produce identical anchors in both documents, wherever they sit.

    Expected windows per doc = n_tokens / anchor_stride; a shared verbatim
    run of >= anchor_stride + window_tokens tokens is caught with high
    probability. All JVM-side (split/sequence/transform/filter/xxhash64).
    """
    T, s = cfg.substring_window_tokens, cfg.substring_anchor_stride
    # Materialize the token array (and per-token hashes) ONCE as real
    # columns before any per-position lambda touches them. Referencing
    # split(...) inside lambda bodies makes Catalyst re-evaluate the split
    # per array element — O(n_tokens^2) string work per document (measured
    # 89s for the 500k-doc stage). CollapseProject would re-inline the
    # expressions through stacked selects; the nondeterministic `_b`
    # columns are deliberate collapse barriers.
    #
    # Anchor selection is WINNOWING (argmin of each s-length hash window,
    # leftmost tie-break): guarantees >= 1 anchor in every s consecutive
    # positions regardless of content — a plain hash%s==0 rule finds NO
    # anchor in low-diversity boilerplate (e.g. a 9-distinct-token error
    # page), silently missing exactly the hot near-dup families. A shared
    # verbatim run of >= s+T tokens is caught deterministically.
    toked = fams.select(
        "norm_hash",
        "fam_count",
        "fam_tb",
        F.split(F.trim(F.col("norm_text")), r"\s+").alias("tk"),
        F.rand(42).alias("_b"),
    )
    tk = F.col("tk")
    hashed = toked.select(
        "norm_hash",
        "fam_count",
        "fam_tb",
        "tk",
        F.transform(tk, lambda t: F.xxhash64(t)).alias("th"),
        F.rand(43).alias("_b"),
    )
    th = F.col("th")
    # sliding-window minimum by doubling: m[i] = min(th[i .. i+s-1]) in
    # O(log s) whole-array passes (concat/slice/zip_with) — NO
    # per-position lambda slices (an argmin-per-window formulation
    # allocates O(n*s) structs per row and was measured ~10x slower).
    INF = (1 << 63) - 1
    m = th
    w = 1
    while w < s:
        step = min(w, s - w)
        shifted = F.concat(
            F.slice(m, step + 1, F.greatest(F.size(m) - step, F.lit(1))),
            F.array_repeat(F.lit(INF), step),
        )
        m = F.zip_with(m, shifted, lambda a_, b_: F.least(a_, b_))
        w += step
    minned = hashed.select(
        "norm_hash",
        "fam_count",
        "fam_tb",
        "tk",
        "th",
        m.alias("wmin"),
        F.rand(44).alias("_b"),
    )
    # anchor = position whose own hash equals its forward-window min
    # (leftmost min of the window starting there). For iid token hashes an
    # anchor occurs every ~s positions; for constant/boilerplate runs
    # EVERY position anchors — content cannot suppress anchors.
    is_anchor = F.zip_with(
        F.col("th"), F.col("wmin"), lambda a_, b_: (a_ == b_).cast("int")
    )
    anchors = F.filter(
        F.transform(
            is_anchor, lambda e, i: F.when(e == 1, i + 1).otherwise(F.lit(-1))
        ),
        lambda x: (x > 0) & (x <= F.size(F.col("tk")) - (T - 1)),
    )
    anchored = minned.select(
        "norm_hash",
        "fam_count",
        "fam_tb",
        "tk",
        anchors.alias("anchors"),
        F.rand(45).alias("_b"),
    )
    wins = F.transform(
        F.col("anchors"),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("tk"), i, T))),
    )
    return (
        anchored.filter(F.size(tk) >= T)
        .select(
            "norm_hash",
            "fam_count",
            "fam_tb",
            F.posexplode(wins).alias("band_id", "band_hash"),
        )
        # window ordinal is not a meaningful bucket axis (unlike LSH band
        # id): bucket purely by content hash so equal windows at different
        # ordinals still collide. Constant id keeps the (band_id,
        # band_hash) bucket schema shared with the LSH pass.
        .withColumn("band_id", F.lit(1_000_000))
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
