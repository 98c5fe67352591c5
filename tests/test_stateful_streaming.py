"""Stateful streaming near-dup matcher tests (applyInPandasWithState):
within-batch matching, exact-repeat suppression, and cross-restart state
resume via the checkpoint — the graft of the reference's in-flight
tracker semantics (lib/markdup_sam.py:63-72,236-239)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.streaming.stateful_neardup import (
    MATCH_SCHEMA,
    streaming_neardup_matches,
)
from umi_dedup_spark.synth import make_pages

CFG = DedupConfig(shuffle_partitions=4)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, PAGES_SCHEMA).write.mode("append").parquet(path)


def _run_stream(spark, src, ckpt, out_dir):
    # parquet file sink: unlike the memory sink it supports checkpoint
    # recovery, which the restart test depends on
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    matches = streaming_neardup_matches(stream, CFG, watermark="1 minute")
    q = (
        matches.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.schema(MATCH_SCHEMA).parquet(out_dir)


def _mk_rows(corpus):
    return [
        (r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in corpus.rows
    ]


def test_stream_matches_within_batch(spark, tmp_path):
    corpus = make_pages(n_docs=80, seed=11)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batch(spark, _mk_rows(corpus), src)
    out = _run_stream(spark, src, ckpt, str(tmp_path / "out")).collect()
    # near-dup families are planted (token-edit variants): matches must
    # surface, every match within the Hamming threshold
    assert out, "no streaming matches on a corpus with planted near-dups"
    assert all(r["hamming"] <= CFG.hamming_threshold for r in out)
    assert all(r["norm_hash"] != r["matched_norm_hash"] for r in out)


def test_stream_state_survives_restart(spark, tmp_path):
    """Docs in batch 2 must match against state stored from batch 1 —
    the tracker persists across micro-batch restarts via the checkpoint."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    # long varied-vocabulary text: a single-token edit keeps the SimHash
    # inside the Hamming ball (tiny texts swing too many bits per edit)
    base = " ".join(f"w{i}" for i in range(500))
    edited = base.replace("w70 ", "zz ", 1)

    _write_batch(spark, [("u1", t0, b"", base, "en")], src)
    out1 = _run_stream(spark, src, ckpt, str(tmp_path / "out")).collect()
    assert out1 == []  # nothing to match yet

    _write_batch(
        spark, [("u2", t0 + datetime.timedelta(seconds=30), b"", edited, "en")], src
    )
    out2 = _run_stream(spark, src, ckpt, str(tmp_path / "out")).collect()
    assert out2, "batch-2 near-dup did not match batch-1 state"
    assert all(r["hamming"] <= CFG.hamming_threshold for r in out2)


def test_stream_exact_repeat_suppressed(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    text = "one two three four five six seven eight nine ten " * 8
    _write_batch(
        spark,
        [("u1", t0, b"", text, "en"), ("u2", t0, b"", text, "en")],
        src,
    )
    out = _run_stream(spark, src, ckpt, str(tmp_path / "out")).collect()
    # identical text = same norm_hash: an exact repeat, not a near-dup match
    assert out == []
