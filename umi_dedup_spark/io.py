"""Table IO abstraction.

The north rule targets Iceberg tables; the sandbox has no Iceberg jars, so
all IO goes through this module: Iceberg catalog when
``spark.sql.catalog.*`` is configured with the runtime jars present,
plain Parquet directories otherwise (SURVEY.md §7 "Iceberg in sandbox").

Sink provenance mirrors the reference's BAM-header program-line append
(``/root/reference/dedup.py:32-40``): every write records a manifest entry
(stage name, row count, config hash, wall time) next to the data — the
Iceberg analog is snapshot summary properties.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from umi_dedup_spark.config import DedupConfig

MANIFEST_NAME = "_manifest.json"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.dedup", None))
    except Exception:
        return False


def read_table(spark: SparkSession, path_or_tbl: str) -> DataFrame:
    """Read a pipeline table: Iceberg identifier or Parquet path/dir."""
    if _iceberg_available(spark) and not path_or_tbl.startswith("/"):
        return spark.read.format("iceberg").load(path_or_tbl)
    return spark.read.parquet(path_or_tbl)


def write_table(
    df: DataFrame,
    path_or_tbl: str,
    *,
    stage: str,
    config: DedupConfig | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    extra: dict[str, Any] | None = None,
) -> int:
    """Write a stage snapshot + manifest; returns row count written."""
    spark = df.sparkSession
    t0 = time.time()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if _iceberg_available(spark) and not path_or_tbl.startswith("/"):
        writer.format("iceberg").saveAsTable(path_or_tbl)
        n = spark.read.format("iceberg").load(path_or_tbl).count()
        return n
    writer.parquet(path_or_tbl)
    n = spark.read.parquet(path_or_tbl).count()
    manifest = {
        "stage": stage,
        "rows": n,
        "wall_sec": round(time.time() - t0, 3),
        "complete": True,
        "config": asdict(config) if config else None,
        "extra": extra or {},
    }
    with open(os.path.join(path_or_tbl, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return n


def write_frequency_table(df: DataFrame, path: str) -> None:
    """S6 (reference ``make_frequency_table.py:25``): emit the fingerprint
    frequency table as tab-separated ``key \\t count`` — the graft of the
    UMI table format (``lib/umi_data.py:105-119``)."""
    df.select("norm_hash", "fam_count").write.mode("overwrite").option(
        "sep", "\t"
    ).csv(path)


def read_frequency_table(spark: SparkSession, path: str) -> DataFrame:
    """S5: parse ``key \\t count`` lines into a frequency DataFrame;
    malformed/short lines tolerated (dropped), mirroring the reference's
    lenient parse (``lib/umi_data.py:105-119``)."""
    df = spark.read.option("sep", "\t").schema("norm_hash long, fam_count long").csv(path)
    return df.filter("norm_hash is not null and fam_count is not null")


def stage_complete(path: str) -> bool:
    """True iff a previous run finished writing this stage (resume check)."""
    mf = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mf):
        return False
    try:
        with open(mf) as f:
            return bool(json.load(f).get("complete"))
    except Exception:
        return False


def read_manifest(path: str) -> dict[str, Any] | None:
    mf = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)
