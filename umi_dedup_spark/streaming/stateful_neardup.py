"""Stateful streaming near-duplicate matching — the graft of the
reference's in-flight duplicate tracker (``lib/markdup_sam.py:63-72``:
alignment buffer keyed by group scope, mutated as reads stream in, state
evicted at the horizon) as a custom Structured Streaming operator via
``applyInPandasWithState``.

Keying mirrors the batch LSH pass: each document explodes into its
(band_id, band_hash) bucket keys; per bucket the operator keeps the
(norm_hash, simhash) of previously seen documents and emits a match row
whenever a new arrival lands within the SimHash Hamming ball of a stored
one — the streaming analog of within-bucket candidate pairs. State per
bucket is capped at ``max_bucket_families`` (the same skew bound as the
batch pass; overflow arrivals still emit matches against stored members
but are not stored) and evicted by event-time timeout once the watermark
passes (the reference's eviction horizon, ``markdup_sam.py:236-239``).

Full cluster formation (count-ordered CC) remains batch — this operator
surfaces near-dup MATCHES at ingest latency.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.functions.hashing import make_fingerprint_udf
from umi_dedup_spark.functions.text import normalize_text, usable_filter


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of int64 values (numpy<2 lacks bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x.view(np.uint64)).astype(np.int64)
    v = x.view(np.uint64).copy()
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    v = v - ((v >> np.uint64(1)) & m1)
    v = (v & m2) + ((v >> np.uint64(2)) & m2)
    v = (v + (v >> np.uint64(4))) & m4
    return ((v * h01) >> np.uint64(56)).astype(np.int64)

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("band_id", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("norm_hash", T.LongType()),
        T.StructField("matched_norm_hash", T.LongType()),
        T.StructField("hamming", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("sims", T.ArrayType(T.LongType())),
    ]
)


def _match_fn(cfg: DedupConfig, timeout_ms: int):
    thr = cfg.hamming_threshold
    cap = cfg.max_bucket_families

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            hashes, sims = state.get
            hashes, sims = list(hashes), list(sims)
        else:
            hashes, sims = [], []
        band_id, band_hash = key
        out_rows = []
        max_event_ms = 0
        stored_sims = np.array(sims, dtype=np.int64)
        for pdf in pdfs:
            if len(pdf):
                ts = pd.to_datetime(pdf["warc_ts"]).max()
                max_event_ms = max(max_event_ms, int(ts.value // 1_000_000))
            for nh, sh in zip(pdf["norm_hash"], pdf["simhash"]):
                nh, sh = int(nh), int(sh)
                if nh in hashes:
                    continue  # exact repeat within the bucket horizon
                if len(stored_sims):
                    # vectorized Hamming against every stored member
                    d = np.bitwise_xor(stored_sims, np.int64(sh))
                    ham = _popcount64(d)
                    for idx in np.flatnonzero(ham <= thr):
                        out_rows.append(
                            (band_id, band_hash, nh, hashes[idx], int(ham[idx]))
                        )
                if len(hashes) < cap:
                    hashes.append(nh)
                    sims.append(sh)
                    stored_sims = np.array(sims, dtype=np.int64)
        state.update((hashes, sims))
        # anchor eviction to EVENT time, not the engine watermark: on the
        # first batch the watermark is still 0, so watermark+ttl would sit
        # in 1970 and the state would be evicted the moment the watermark
        # jumps to real event time (the reference evicts at an
        # event-coordinate horizon too, markdup_sam.py:236-239)
        horizon = max(state.getCurrentWatermarkMs(), max_event_ms) + timeout_ms
        state.setTimeoutTimestamp(horizon)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "band_id", "band_hash", "norm_hash",
                    "matched_norm_hash", "hamming",
                ],
            )

    return fn


def streaming_neardup_matches(
    stream: DataFrame,
    cfg: DedupConfig,
    watermark: str = "10 minutes",
    state_ttl_ms: int = 600_000,
) -> DataFrame:
    """pages stream -> per-bucket near-dup match stream.

    Plan: usable filter -> normalize -> Arrow fingerprint UDF -> LSH band
    explode -> groupBy bucket -> applyInPandasWithState (per-bucket seen
    set, event-time timeout). Emits one row per (bucket, new doc, stored
    match) within the Hamming threshold.
    """
    fp_udf = make_fingerprint_udf(cfg.shingle_k, cfg.num_perm, cfg.seed)
    usable = stream.filter(usable_filter(F.col("text"), cfg.min_text_chars))
    norm = normalize_text(F.col("text"), cfg.lowercase, cfg.collapse_whitespace)
    fams = (
        usable.withColumn("norm_hash", F.xxhash64(norm))
        .withColumn("fp", fp_udf(norm))
        .select(
            "warc_ts",
            "norm_hash",
            F.col("fp.minhash").alias("minhash"),
            F.col("fp.simhash").alias("simhash"),
        )
    )
    # band explode inline (same banding as the batch pass), keeping the
    # event-time and simhash columns — no stream-stream self-join needed
    r = cfg.lsh_rows
    band_cols = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice(F.col("minhash"), b * r + 1, r))
            for b in range(cfg.lsh_bands)
        ]
    )
    banded = fams.select(
        "warc_ts",
        "norm_hash",
        "simhash",
        F.posexplode(band_cols).alias("band_id", "band_hash"),
    )
    return (
        banded.withWatermark("warc_ts", watermark)
        .groupBy("band_id", "band_hash")
        .applyInPandasWithState(
            _match_fn(cfg, state_ttl_ms),
            outputStructType=MATCH_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
