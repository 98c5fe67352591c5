"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata (training-data-pipeline surface).

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual media codecs are NOT in this
container, so the decode kernels are deterministic fakes behind
``decode_available()`` / clearly marked stubs. Swapping in PIL/ffmpeg is a
one-function change; the distributed plan is unchanged.

Pattern: ``mapInPandas`` over batches of (id, media, meta) so one Python
worker invocation amortizes Arrow transfer across the whole batch, and
wide binary columns never pass through a shuffle — feature extraction is
a narrow map, only the (small) feature vectors shuffle afterwards.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha long, feature array<float>"
)


def decode_available() -> bool:
    """True iff real media codecs are importable (PIL / soundfile)."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_features(payload: bytes, kind: str, n_dims: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode + feature-extract: a seeded
    projection of the payload digest. NOT a real decoder — marked stub;
    replace with PIL/ffmpeg when codecs are present."""
    if payload is None:
        return np.zeros(n_dims, dtype=np.float32)
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.RandomState(np.frombuffer(digest[:4], dtype=np.uint32)[0])
    return rng.normal(size=n_dims).astype(np.float32)


def extract_features(media: DataFrame, n_dims: int = 16) -> DataFrame:
    """Decode/feature-extract via mapInPandas (batch-at-a-time Arrow)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, k, n_dims)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha": [
                        int.from_bytes(
                            hashlib.blake2b(p or b"", digest_size=8).digest(),
                            "little",
                            signed=True,
                        )
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: validates schema + batch shape, raises at the
    kernel when no codec is present (clearly-marked stub)."""
    if not decode_available():
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "image codecs not available in this container; "
                "install PIL and replace the kernel in resize_images"
            )
            yield  # pragma: no cover

        return media.filter(F.col("kind") == "image").mapInPandas(
            run, schema=MEDIA_SCHEMA
        )
    raise NotImplementedError("real codec path not wired yet")


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts) rows from
    metadata — the real frame decode is the stubbed kernel above; the
    timestamp expansion is honest JVM-side work."""
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.randint(0, 64)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                int(rng.randint(16, 512)) if kind == "image" else None,
                int(rng.randint(16, 512)) if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
