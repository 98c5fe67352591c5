#!/usr/bin/env python
"""Run the full SQL-oracle correctness board at an arbitrary scale factor
(VERDICT r3 "Next round" #5).

The driver's board runs at sf0.01 (500 docs); several oracle mirrors have
SCALE-DEPENDENT failure modes the small board cannot exercise — LSH band
equality joins (bucket overflow flips the engine to star+chain, which the
SQL does not mirror), winnowing window mirrors (collision odds grow with
corpus size), and the 64-bit hash dialects (collision probability).
This harness replicates the driver comparison (row count + column names +
order-insensitive value hash) against DuckDB at sf0.1 (5,000 docs) — or
any $SPARK_GRAFT_SF_DIR — and prints one JSON line per query plus a
summary. Queries whose DuckDB mirror is super-linear get a generous
per-query timeout and report 'timeout' rather than failing the board.

Usage: python BENCH/oracle_parity.py [sf_dir] [only,csv]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from umi_dedup_spark.session import get_spark, warm_python_workers  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def _canon(value):
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.9g}"
    return str(value)


def _hashable(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return [tuple(cols[i] for i in order)] + out


def main() -> None:
    spark = get_spark("oracle-parity", shuffle_partitions=32)
    warm_python_workers(spark)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        except Exception:
            pass

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sorted(oracles)
    results = {}
    for name in names:
        if ONLY and name not in ONLY:
            continue
        rec: dict = {"query": name}
        try:
            t0 = time.time()
            sdf = queries[name](spark, SF_DIR)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
            rec["duck_sec"] = round(time.time() - t0, 1)
            rec["rows"] = len(spark_rows)
            rec["rows_match"] = len(spark_rows) == len(duck_rows)
            rec["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
            sh = _hashable(spark_cols, spark_rows)
            dh = _hashable(duck_cols, duck_rows)
            rec["hash_match"] = sh == dh
            if not rec["hash_match"]:
                rec["first_diff"] = str(
                    [(a, b) for a, b in zip(sh, dh) if a != b][:2]
                )[:400]
        except Exception as e:  # noqa: BLE001 — report, keep the board running
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        print(json.dumps(rec), flush=True)

    ok = sum(
        1 for r in results.values()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    )
    print(json.dumps({
        "sf_dir": SF_DIR, "green": ok, "total": len(results),
        "failing": [n for n, r in results.items()
                    if not (r.get("rows_match") and r.get("schema_match")
                            and r.get("hash_match"))],
    }), flush=True)


if __name__ == "__main__":
    main()
