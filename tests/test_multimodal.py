"""Multimodal plumbing tests: schema, batch shape, deterministic stub
features, frame sampling (decode kernels are stubs — the Spark-side
distribution plan is what's under test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.operators.multimodal import (
    decode_available,
    extract_features,
    frame_sample,
    resize_images,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30, seed=42).localCheckpoint()


def test_extract_features_schema_and_determinism(media):
    out = extract_features(media, n_dims=8)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # deterministic across runs
    rows2 = extract_features(media, n_dims=8).collect()
    d1 = {r["media_id"]: (r["sha"], tuple(r["feature"])) for r in rows}
    d2 = {r["media_id"]: (r["sha"], tuple(r["feature"])) for r in rows2}
    assert d1 == d2


def test_identical_payload_identical_sha(spark):
    m = synth_media(spark, n=9, seed=7)
    doubled = m.union(m)
    out = extract_features(doubled).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], set()).add(r["sha"])
    assert all(len(v) == 1 for v in by_id.values())


def test_frame_sample_counts(media):
    out = frame_sample(media, every_ms=5000)
    rows = out.groupBy("media_id").count().collect()
    vids = media.filter("kind = 'video'").collect()
    expect = {v["media_id"]: v["duration_ms"] // 5000 + 1 for v in vids}
    got = {r["media_id"]: r["count"] for r in rows}
    assert got == expect


def test_resize_stub_raises_without_codec(media, spark):
    if decode_available():
        pytest.skip("codec present")
    from py4j.protocol import Py4JJavaError

    df = resize_images(media, 64, 64)
    with pytest.raises(Exception):
        df.collect()
