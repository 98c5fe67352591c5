"""Latest-snapshot compaction: keep the newest record per logical key.

Web-crawl graft of the reference's "one representative per family" rule
(``markdup_sam.py:247-258`` picks a single survivor per duplicate
group): a crawler re-fetches the same url across snapshots, and the
corpus wants exactly one row per url — the most recent ``warc_ts``
fetch. The driver testdata carries the same shape on the ``events``
table ((user_id, event_type) re-observed across ``ts``), so the board
query runs there; the pipeline applies it to (url) x warc_ts.

Scale shape — ONE hash aggregation, not a window:

* ``row_number() OVER (PARTITION BY key ORDER BY ts DESC)`` shuffles
  every payload byte and then SORTS each partition — at 10^12 rows the
  sort dominates and a hot key (a url fetched millions of times)
  serializes on one task.
* ``max(struct(ts, tiebreak, payload...))`` is an ordinary aggregate:
  Spark's struct ordering is lexicographic by field position, so the
  max struct IS the latest row. Partial aggregation (map-side combine)
  reduces each input partition to one candidate per key BEFORE the
  shuffle — the exchange carries at most n_distinct_keys rows per map
  partition regardless of how hot a key is. The physical plan is a
  partial/final SortAggregate pair (a struct buffer is immutable, so
  HashAggregate is ineligible); its sorts are by the GROUPING KEY
  only — the fetch history of a key is never ordered by ts anywhere,
  which is the cost the window formulation cannot avoid. AQE coalesces
  the post-shuffle side. This is the same max-struct-instead-of-window
  trade the representative picker uses
  (``operators/representative.py``).

Determinism: the struct leads with (ts, tiebreak); callers pass a
unique tiebreak column (event_id / warc record id) so ties on ts cannot
make the payload fields decide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str | None = None,
    payload: list[str] | None = None,
) -> DataFrame:
    """One row per ``keys``: the one with the greatest (ts, tiebreak).

    Returns ``keys + [ts_col, tiebreak] + payload`` with original
    column names. With ``tiebreak=None`` (no unique record id — e.g. raw
    crawl pages identified only by (url, warc_ts)), ties on ts fall
    through to the payload fields' lexicographic order: still fully
    deterministic, just not caller-chosen.

    Payload columns ride inside a ``max(struct(...))`` aggregate, so every
    payload type must be ORDERABLE (struct comparison requirement; the ts
    and tiebreak prefix decides in practice, but Spark rejects the
    aggregate at analysis time otherwise). MapType is the one common
    non-orderable type — detected here with a clear error naming the
    column (wrap it with ``to_json`` or exclude it via ``payload``).
    """
    tb = [tiebreak] if tiebreak else []
    if payload is None:
        payload = [c for c in df.columns if c not in (*keys, ts_col, *tb)]
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        # recurse: a MapType nested inside a struct or array payload
        # column is just as non-orderable as a top-level one and used to
        # fail with the original opaque analysis error (ADVICE r5)
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    fields = {f.name: f.dataType for f in df.schema.fields}
    bad = [c for c in payload if c in fields and _has_map(fields[c])]
    if bad:
        raise TypeError(
            f"latest_snapshot payload column(s) {bad} contain MapType "
            "(possibly nested in a struct/array), which is not orderable "
            "inside max(struct(...)); wrap with to_json() or pass "
            "payload=[...] excluding them"
        )
    packed = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias("_tb") for c in tb],
        *[F.col(c).alias(f"_p{i}") for i, c in enumerate(payload)],
    )
    agg = df.groupBy(*keys).agg(F.max(packed).alias("_latest"))
    out = agg.select(
        *keys,
        F.col("_latest._ts").alias(ts_col),
        *[F.col("_latest._tb").alias(c) for c in tb],
        *[F.col(f"_latest._p{i}").alias(c) for i, c in enumerate(payload)],
    )
    return out
