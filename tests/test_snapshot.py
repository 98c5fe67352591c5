"""latest_snapshot operator: keep-newest-per-key compaction.

Semantics (newest ts wins, ties broken by the tiebreak column, payload
travels intact) plus the plan contract that justifies the operator's
existence: ONE hash aggregation with a partial (map-side) phase and NO
window/sort anywhere in the physical plan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from umi_dedup_spark.operators.snapshot import latest_snapshot

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampNTZType()),
        T.StructField("rec_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_latest_wins(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00"), 1, "old"),
            ("a", _ts("2024-03-01T00:00:00"), 2, "new"),
            ("b", _ts("2024-02-01T00:00:00"), 3, "only"),
        ],
        SCHEMA,
    )
    out = {
        r.url: (r.warc_ts, r.rec_id, r.text)
        for r in latest_snapshot(df, ["url"], "warc_ts", "rec_id").collect()
    }
    assert out["a"] == (_ts("2024-03-01T00:00:00"), 2, "new")
    assert out["b"] == (_ts("2024-02-01T00:00:00"), 3, "only")


def test_ts_tie_broken_by_tiebreak_not_payload(spark):
    # identical ts; the row with the larger rec_id must win even though
    # its payload sorts LOWER lexicographically (catches any accidental
    # payload participation in the max-struct ordering)
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00"), 1, "zzz"),
            ("a", _ts("2024-01-01T00:00:00"), 2, "aaa"),
        ],
        SCHEMA,
    )
    row = latest_snapshot(df, ["url"], "warc_ts", "rec_id").collect()[0]
    assert (row.rec_id, row.text) == (2, "aaa")


def test_null_payload_survives(spark):
    df = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"), 1, None)], SCHEMA
    )
    row = latest_snapshot(df, ["url"], "warc_ts", "rec_id").collect()[0]
    assert row.text is None and row.rec_id == 1


def test_one_row_per_key_and_columns(spark):
    rows = [
        (f"u{i % 7}", _ts("2024-01-01T00:00:00") + dt.timedelta(hours=i), i, f"t{i}")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = latest_snapshot(df, ["url"], "warc_ts", "rec_id")
    assert out.columns == ["url", "warc_ts", "rec_id", "text"]
    got = out.collect()
    assert len(got) == 7
    # newest per key: i = 49, 48, ... 43 carry the max hour per url bucket
    assert {r.rec_id for r in got} == set(range(43, 50))


def test_no_tiebreak_falls_to_payload_deterministically(spark):
    # no record id: ties on ts resolve by payload lexicographic order
    # (greatest wins) — deterministic across runs and partitionings
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00"), 7, "alpha"),
            ("a", _ts("2024-01-01T00:00:00"), 3, "zeta"),
        ],
        SCHEMA,
    ).repartition(4)
    out = latest_snapshot(df, ["url"], "warc_ts")
    assert out.columns == ["url", "warc_ts", "rec_id", "text"]
    row = out.collect()[0]
    assert (row.rec_id, row.text) == (7, "alpha")  # rec_id=7 > rec_id=3


def test_plan_partial_agg_no_window_no_ts_sort(spark):
    df = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"), 1, "x")], SCHEMA
    )
    plan = (
        latest_snapshot(df, ["url"], "warc_ts", "rec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    # partial + final aggregate pair => map-side combine before the
    # exchange (the at-scale contract: the shuffle carries one candidate
    # per key per map partition, not the full fetch history)
    assert "partial_max" in plan, plan
    # the aggregate's sorts order by the grouping key only; the per-key
    # history is never sorted by ts (what a window formulation must do)
    for line in plan.splitlines():
        if "Sort [" in line:
            assert "warc_ts" not in line.split("Sort [", 1)[1].split("]")[0], line


def test_nested_maptype_payload_rejected_with_clear_error(spark):
    # r6 (ADVICE r5): MapType nested inside a struct or array payload
    # column is as non-orderable as a top-level one — the guard must
    # name the column instead of the opaque analysis error
    import pytest
    from pyspark.sql import functions as F

    from umi_dedup_spark.operators.snapshot import latest_snapshot

    df = spark.createDataFrame(
        [(1, 10, "a")], "k long, ts long, v string"
    ).withColumn("payload", F.struct(F.create_map(F.lit("x"), F.lit(1)).alias("m")))
    with pytest.raises(TypeError, match="payload"):
        latest_snapshot(df, keys=["k"], ts_col="ts")
    # excluding the offending column still works
    out = latest_snapshot(df, keys=["k"], ts_col="ts", payload=["v"])
    assert out.collect()[0]["v"] == "a"
