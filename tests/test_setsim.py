"""Prefix-filtered set-similarity join == quadratic all-pairs ground truth.

The operator (operators/setsim.py) must return EXACTLY the rows of the
naive per-group quadratic self-join for every corpus — prefix filtering
is a pure pruning of provably-unqualifiable pairs. The ground truth here
is the same quadratic Spark SQL that serves as the DuckDB oracle mirror
(__spark_entry__.q_ngram_jaccard_pairs), so these tests also pin the
entry-query parity locally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umi_dedup_spark.operators.setsim import jaccard_similarity_join

import __spark_entry__ as entry_mod


def _tset(docs):
    return docs.select(
        "doc_id",
        "source",
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("tset"),
    )


def _quadratic(spark, docs, threshold):
    docs.createOrReplaceTempView("documents")
    sql = entry_mod.q_ngram_jaccard_pairs("s").replace(
        "cast(0.5 AS double)", f"cast({threshold} AS double)"
    )
    return spark.sql(sql)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_match(spark, docs, threshold=0.5):
    want = _rows(_quadratic(spark, docs, threshold))
    # cap=0 forces the prefix-filtered path everywhere; the huge cap
    # forces the quadratic path everywhere; 3 exercises the split with
    # groups on both sides — all three must agree with the ground truth
    # (bitset probe disabled so the caps actually select those paths)
    for cap in (0, 3, 10**9):
        got = jaccard_similarity_join(
            _tset(docs), id_col="doc_id", group_col="source",
            threshold=threshold, quadratic_group_cap=cap,
            bitset_vocab_cap=0,
        )
        assert _rows(got) == want, f"cap={cap}"
    # the small-universe bitset path (these corpora all have tiny
    # vocabularies, so the default probe selects it) must agree too
    got = jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source",
        threshold=threshold,
    )
    assert _rows(got) == want, "bitset"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_matches_quadratic_on_driver_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = _rows(_quadratic(spark, docs, 0.5))
    assert len(want) > 100  # non-trivial corpus
    for cap in (0, 10**9):  # prefix path and quadratic path
        got = jaccard_similarity_join(
            _tset(docs), id_col="doc_id", group_col="source",
            threshold=0.5, quadratic_group_cap=cap, bitset_vocab_cap=0,
        )
        assert _rows(got) == want, f"cap={cap}"
    # default config: the driver corpus has a 31-token vocabulary, so the
    # bitset path is the one the declared query actually runs
    got = jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source", threshold=0.5,
    )
    assert _rows(got) == want, "bitset"


def test_boundary_identical_and_disjoint(spark):
    docs = _mk(spark, [
        # J exactly 0.5: {a b} vs {a b c d} -> 2/4 (boundary kept)
        (1, "s1", "a b"),
        (2, "s1", "a b c d"),
        # identical docs -> J = 1.0
        (3, "s1", "x y z"),
        (4, "s1", "x y z"),
        # J just under: {a b c} vs {a b c d e f g} -> 3/7
        (5, "s1", "a b c"),
        (6, "s1", "a b c d e f g"),
        # disjoint
        (7, "s1", "p q r"),
        # same text, different source -> never paired
        (8, "s2", "a b"),
        # duplicate tokens collapse: "a a b b" == {a b}
        (9, "s1", "a a b b"),
    ])
    _assert_match(spark, docs)
    got = _rows(jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source", threshold=0.5
    ))
    assert (1, 2, 0.5) in got          # boundary pair kept
    assert (3, 4, 1.0) in got          # identical pair
    assert (1, 9, 1.0) in got          # duplicate tokens collapsed
    assert not any(7 in (a, b) for a, b, _ in got)
    assert not any(8 in (a, b) for a, b, _ in got)


def test_hot_token_and_skew(spark):
    # every doc shares a stopword-like hot token; families of near-dups;
    # a long boilerplate band in one source (the skew case the quadratic
    # plan handles trivially and prefix filtering must not corrupt)
    rows = []
    for i in range(60):
        rows.append((100 + i, "hot", f"the common w{i % 7} w{(i + 1) % 7} u{i}"))
    for i in range(40):
        rows.append((200 + i, "band", "the quick brown fox jumps over the lazy dog"))
    rows.append((300, "band", "the quick brown fox jumps over a sleepy dog"))
    docs = _mk(spark, rows)
    _assert_match(spark, docs)


@pytest.mark.parametrize("threshold", [0.3, 0.7, 1.0])
def test_other_thresholds(spark, threshold):
    docs = _mk(spark, [
        (1, "s", "a b c d e"),
        (2, "s", "a b c d f"),
        (3, "s", "a b x y z"),
        (4, "s", "a b c d e"),
        (5, "s", "m"),
        (6, "s", "m"),
        (7, "s", "m n"),
    ])
    _assert_match(spark, docs, threshold)


def test_null_text_and_null_source(spark):
    docs = _mk(spark, [
        (1, "s", None),        # null text: no tokens, no pairs
        (2, "s", "a b"),
        (3, "s", "a b"),
        (4, None, "a b"),      # null source matches nothing (SQL equi-join)
        (5, None, "a b"),
    ])
    _assert_match(spark, docs)
    got = _rows(jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source", threshold=0.5
    ))
    assert got == [(2, 3, 1.0)]


def test_no_group_column(spark):
    # group_col=None: pairs across the whole corpus
    docs = _mk(spark, [
        (1, "s1", "a b c"),
        (2, "s2", "a b c"),
        (3, "s3", "x y z"),
    ])
    got = _rows(jaccard_similarity_join(
        _tset(docs), id_col="doc_id", threshold=0.5
    ))
    assert got == [(1, 2, 1.0)]


def test_caches_released(spark):
    docs = _mk(spark, [(1, "s", "a b"), (2, "s", "a b c")])
    caches: list = []
    out = jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source", caches=caches,
        bitset_vocab_cap=0,
    )
    assert out.count() == 1
    # base projection + prefix index (both multi-consumer)
    assert len(caches) == 2 and all(c.is_cached for c in caches)
    for c in caches:
        c.unpersist()
    assert not any(c.is_cached for c in caches)
    # bitset path: only the base projection is multi-consumer
    caches = []
    out = jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source", caches=caches
    )
    assert out.count() == 1
    assert len(caches) == 1 and caches[0].is_cached
    caches[0].unpersist()


def test_bitset_path_properties(spark):
    # vocab above the cap falls through to the array paths (same result);
    # a 65-token vocabulary cannot fit a 64-bit mask
    rows = [(i, "s", f"t{i} t{(i + 1) % 65} shared") for i in range(65)]
    docs = _mk(spark, rows)
    want = _rows(_quadratic(spark, docs, 0.5))
    got = _rows(jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source", threshold=0.5
    ))
    assert got == want
    # cap validation
    with pytest.raises(ValueError):
        jaccard_similarity_join(
            _tset(docs), id_col="doc_id", group_col="source",
            bitset_vocab_cap=65,
        )
    # groupless bitset join stays an equi-join (constant key), never a
    # cartesian/BNLJ
    small = _mk(spark, [(1, "s1", "a b c"), (2, "s2", "a b c"),
                        (3, "s3", "x y z")])
    out = jaccard_similarity_join(_tset(small), id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert _rows(out) == [(1, 2, 1.0)]


def test_plan_has_no_quadratic_join(spark):
    docs = _mk(spark, [(1, "s", "a b"), (2, "s", "a b c")])
    plan = jaccard_similarity_join(
        _tset(docs), id_col="doc_id", group_col="source"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_threshold_validation(spark):
    docs = _mk(spark, [(1, "s", "a")])
    with pytest.raises(ValueError):
        jaccard_similarity_join(_tset(docs), threshold=0.0)
    with pytest.raises(ValueError):
        jaccard_similarity_join(_tset(docs), threshold=1.5)
