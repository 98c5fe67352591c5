"""Streaming exact-dedup: watermark + dropDuplicatesWithinWatermark
(the reference's eviction-horizon stream semantics)."""

from __future__ import annotations

import pytest

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.streaming.dedup_stream import streaming_exact_dedup
from umi_dedup_spark.synth import make_pages


def test_streaming_exact_dedup(spark, tmp_path):
    corpus = make_pages(n_docs=60, seed=3)
    src = str(tmp_path / "src")
    pages = corpus.to_spark(spark)
    pages.write.parquet(src)

    stream = spark.readStream.schema(pages.schema).parquet(src)
    deduped = streaming_exact_dedup(stream, DedupConfig())
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.sql("select * from dedup_stream_out")
    n_out = out.count()
    n_distinct_hash = out.select("norm_hash").distinct().count()
    assert n_out == n_distinct_hash  # exact repeats collapsed
    # matches the batch exact-family count on the same corpus
    from umi_dedup_spark.operators.exact import exact_families, prepare_docs

    n_batch = exact_families(prepare_docs(pages, DedupConfig())).count()
    assert n_out == n_batch
