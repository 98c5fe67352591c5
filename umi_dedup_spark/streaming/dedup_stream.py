"""Streaming exact-dedup: the reference's windowed-buffer semantics
(``lib/markdup_sam.py:63,236-239``: group state evicted once the stream
passes position + MAX_READ_LENGTH) re-expressed as Structured Streaming
state with an event-time watermark.

* watermark on ``warc_ts`` = the eviction horizon (late data beyond the
  bound is dropped rather than erroring — documented divergence from the
  reference's hard error at ``markdup_sam.py:217-224``).
* ``dropDuplicatesWithinWatermark`` on the normalization hash = the
  per-key dedup state with GC (``markdup_sam.py:204,248``).

Near-dup clustering (CC fixpoint) is inherently multi-pass and stays
batch; the streaming layer deduplicates exact repeats at ingest so the
batch near-dup pass sees each distinct text once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.functions.text import normalize_text, usable_filter


def streaming_exact_dedup(
    stream: DataFrame, cfg: DedupConfig, watermark: str = "10 minutes"
) -> DataFrame:
    """pages stream -> usable, normalized, exact-deduped stream.

    One row per distinct norm_hash within the watermark horizon; state for
    a hash is dropped once the watermark passes (bounded memory, exactly
    the reference's eviction rule).
    """
    usable = stream.filter(usable_filter(F.col("text"), cfg.min_text_chars))
    normed = usable.withColumn(
        "norm_hash",
        F.xxhash64(normalize_text(F.col("text"), cfg.lowercase, cfg.collapse_whitespace)),
    )
    return normed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["norm_hash"]
    )
