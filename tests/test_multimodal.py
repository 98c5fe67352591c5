"""Multimodal tests: schema, batch shape, REAL pure-numpy codecs (P6 PPM
images, PCM-16 WAV audio), resize correctness, frame sampling, and the
flagged digest fallback for undecodable payloads."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.operators.multimodal import (
    decode_available,
    decode_ppm,
    decode_ppmv,
    decode_wav,
    encode_ppm,
    encode_ppmv,
    encode_wav,
    extract_features,
    frame_sample,
    resize_array,
    resize_images,
    sample_frames,
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


def test_real_decode_paths_flagged(media):
    """synth_media emits real PPM/WAV payloads: every image and audio row
    must take the real-codec path (decoded=True); opaque video blobs take
    the flagged digest fallback."""
    rows = extract_features(media, n_dims=8).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r["decoded"])
    assert all(by_kind["image"]), "PPM image failed the real decoder"
    assert all(by_kind["audio"]), "WAV audio failed the real decoder"
    # videos: PPMV payloads decode, opaque blobs are flagged
    assert any(by_kind["video"]), "PPMV video failed the real decoder"
    assert not all(by_kind["video"]), "opaque blob wrongly claimed decoded"


def test_ppm_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert decode_ppm(b"NOTAPPM") is None


def test_wav_roundtrip():
    rate = 8000
    t = np.arange(1600) / rate
    samples = 0.25 * np.sin(2 * np.pi * 440 * t)
    out = decode_wav(encode_wav(samples, rate))
    assert out is not None
    got, got_rate = out
    assert got_rate == rate
    assert np.allclose(got, samples, atol=1e-3)
    assert decode_wav(b"RIFFxxxxJUNK") is None


def test_resize_array_box_mean():
    # 4x4 -> 2x2 box resize must average each 2x2 block exactly
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_array(img, 2, 2)
    expect = img.astype(float).reshape(2, 2, 2, 2, 3).mean(axis=(1, 3))
    assert np.array_equal(out, np.rint(expect).astype(np.uint8))


def test_resize_images_executes(media):
    """The decode-resize-encode kernel runs end-to-end on the synth
    payloads and produces decodable PPMs of the target size."""
    assert decode_available()
    rows = resize_images(media, 8, 6).collect()
    assert rows, "no image rows"
    for r in rows:
        assert (r["width"], r["height"]) == (8, 6)
        img = decode_ppm(bytes(r["payload"]))
        assert img is not None and img.shape == (6, 8, 3)


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


def test_ppmv_roundtrip():
    rng = np.random.RandomState(5)
    frames = [
        rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8) for _ in range(5)
    ]
    out = decode_ppmv(encode_ppmv(frames, fps=4))
    assert out is not None
    got, fps = out
    assert fps == 4 and len(got) == 5
    assert all(np.array_equal(a, b) for a, b in zip(got, frames))
    assert decode_ppmv(b"NOTAVID") is None
    # truncated container rejected, not mis-parsed
    assert decode_ppmv(encode_ppmv(frames, 4)[:-10]) is None


def test_sample_frames_decodes_real_frames(media):
    """Every emitted frame is a decodable P6 PPM matching the declared
    size; counts follow ceil(n_frames / every_n) for PPMV videos and 0
    for opaque blobs."""
    rows = sample_frames(media, every_n=2).collect()
    assert rows, "no sampled frames"
    per_vid: dict[int, int] = {}
    for r in rows:
        img = decode_ppm(bytes(r["payload"]))
        assert img is not None and img.shape == (r["height"], r["width"], 3)
        per_vid[r["media_id"]] = per_vid.get(r["media_id"], 0) + 1
    vids = media.filter("kind = 'video'").collect()
    for v in vids:
        dec = decode_ppmv(bytes(v["payload"]))
        expect = 0 if dec is None else (len(dec[0]) + 1) // 2
        assert per_vid.get(v["media_id"], 0) == expect
    # at least one opaque blob yields zero frames
    assert any(
        decode_ppmv(bytes(v["payload"])) is None for v in vids
    ), "synth corpus lost its opaque-blob rows"
