"""ngram_contamination (operators/decontaminate.py): ground-truth checks
on constructed corpora — shared-gram detection, distinct counting, the
short-doc whole-gram convention, and clean-doc zero rows."""

from __future__ import annotations

from umi_dedup_spark.operators.decontaminate import gram_hashes, ngram_contamination

G8 = "a b c d e f g h"  # one 8-token gram


def _run(spark, corpus_rows, bench_rows, k=8):
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    out = ngram_contamination(corpus, bench, k=k)
    return {r["doc_id"]: (r["n_shared_grams"], r["contaminated"]) for r in out.collect()}


def test_shared_gram_detected_and_clean_doc_zero(spark):
    got = _run(
        spark,
        corpus_rows=[(1, f"intro {G8} outro"), (2, "totally unrelated words only here")],
        bench_rows=[(100, f"{G8} benchmark continuation tokens")],
    )
    n1, c1 = got[1]
    assert c1 and n1 >= 1
    assert got[2] == (0, False)


def test_repeated_shared_gram_counts_once(spark):
    # the corpus doc contains the shared gram twice; per-doc grams are
    # distinct, so evidence counts each shared gram once
    got = _run(
        spark,
        corpus_rows=[(1, f"{G8} zz {G8}")],
        bench_rows=[(100, G8)],
    )
    n, c = got[1]
    assert c
    # grams of doc 1 that also appear in bench: exactly the pure G8 gram
    # (every other 8-gram of doc 1 crosses the zz boundary)
    assert n == 1


def test_short_doc_whole_gram_convention(spark):
    # both sides shorter than k tokens: each contributes its whole text
    # as one gram, so a verbatim short benchmark string decontaminates
    got = _run(
        spark,
        corpus_rows=[(1, "tiny exact string"), (2, "tiny other string")],
        bench_rows=[(100, "tiny exact string")],
    )
    assert got[1] == (1, True)
    assert got[2] == (0, False)


def test_normalization_case_and_whitespace(spark):
    got = _run(
        spark,
        corpus_rows=[(1, "  A  B   c d e F g H  ")],
        bench_rows=[(100, "a b c d e f g h")],
    )
    assert got[1] == (1, True)


def test_output_covers_every_corpus_doc(spark):
    rows = [(i, f"doc {i} unique filler text number {i}") for i in range(20)]
    got = _run(spark, corpus_rows=rows, bench_rows=[(100, G8)])
    assert set(got) == set(range(20))
    assert all(v == (0, False) for v in got.values())


def test_gram_hashes_distinct_and_deterministic(spark):
    df = spark.createDataFrame([(1, f"{G8} zz {G8}")], "doc_id long, text string")
    from pyspark.sql import functions as F

    arr1 = df.select(gram_hashes(F.col("text"), 8).alias("g")).collect()[0]["g"]
    arr2 = df.select(gram_hashes(F.col("text"), 8).alias("g")).collect()[0]["g"]
    assert arr1 == arr2
    assert len(arr1) == len(set(arr1))
