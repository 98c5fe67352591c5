"""Paired combined-fingerprint tests (reference extract_umi_paired.py +
lib/parse_fastq.py:112-144 get_read_pair_umis semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.operators.paired import (
    PairMismatchError,
    extract_prefix_key,
    paired_combined_keys,
    paired_key_counts,
)


@pytest.fixture(scope="module")
def mates(spark):
    m1 = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg"), (3, "hh ii")],
        "url long, text string",
    )
    m2 = spark.createDataFrame(
        [(1, "xx yy zz"), (2, "pp qq"), (3, "rr ss")],
        "url long, text string",
    )
    return m1, m2


def test_combined_key_both_sides(spark, mates):
    m1, m2 = mates
    out = paired_combined_keys(m1, m2, key_col="url").collect()
    got = {r["url"]: r["pair_key"] for r in out}
    assert got == {1: "aa bb+xx yy", 2: "ee ff+pp qq", 3: "hh ii+rr ss"}
    # both mates carry the SAME combined field (one row per pair here)
    assert all(r["pair_key"] == f"{r['key1']}+{r['key2']}" for r in out)


def test_separator_dropped_when_one_side_empty(spark, mates):
    """Reference lib/parse_fastq.py:133: umi_length == 0 -> no separator."""
    m1, m2 = mates
    out = paired_combined_keys(m1, m2, key_col="url", n_tokens2=0).collect()
    got = {r["url"]: r["pair_key"] for r in out}
    assert got == {1: "aa bb", 2: "ee ff", 3: "hh ii"}


def test_before_and_mask(spark, mates):
    m1, m2 = mates
    df = spark.createDataFrame([(1, "skip aa bb cc")], "url long, text string")
    key = df.select(
        extract_prefix_key(F.col("text"), 3, before=1, mask=(2,)).alias("k")
    ).collect()[0]["k"]
    assert key == "aa _ cc"


def test_mismatch_raises(spark, mates):
    """Reference lib/parse_fastq.py:134: mismatched reads -> RuntimeError."""
    m1, m2 = mates
    m2_short = m2.filter(F.col("url") != 2)
    with pytest.raises(PairMismatchError):
        paired_combined_keys(m1, m2_short, key_col="url")
    # non-strict: unmatched rows drop instead
    out = paired_combined_keys(m1, m2_short, key_col="url", strict=False)
    assert out.count() == 2


def test_paired_key_counts(spark, mates):
    m1, m2 = mates
    doubled = m1.union(m1)
    pairs = paired_combined_keys(doubled, m2, key_col="url", strict=False)
    counts = {r["pair_key"]: r["n_pairs"] for r in paired_key_counts(pairs).collect()}
    assert counts == {"aa bb+xx yy": 2, "ee ff+pp qq": 2, "hh ii+rr ss": 2}
