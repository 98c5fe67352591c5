"""HTML extraction + URL projection tests, incl. the byte-identical
invariant (same html -> same text, every time, both python- and
Spark-side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from umi_dedup_spark.functions.extract import (
    extract_text,
    extract_text_udf,
    url_host,
    url_path_depth,
)
from umi_dedup_spark.synth import make_pages


def test_extract_text_basic():
    assert extract_text(b"<html><body>hello <b>world</b></body></html>") == "hello world"
    assert extract_text(b"<p>a&amp;b &lt;c&gt;</p>") == "a&b <c>"
    assert extract_text(b"<script>var x=1;</script><p>keep</p>") == "keep"
    assert extract_text(None) == ""


def test_extraction_matches_synth_text(spark):
    # synth corpus wraps text as <html><body>text</body></html>;
    # extraction must recover it byte-identically per url
    pages = make_pages(n_docs=80, seed=4).to_spark(spark)
    out = pages.withColumn("extracted", extract_text_udf(F.col("html")))
    bad = out.filter(F.col("extracted") != F.col("text")).count()
    assert bad == 0


def test_extraction_deterministic_per_url(spark):
    pages = make_pages(n_docs=40, seed=6).to_spark(spark)
    a = pages.withColumn("e", extract_text_udf(F.col("html"))).select("url", "e")
    b = pages.withColumn("e", extract_text_udf(F.col("html"))).select(
        "url", F.col("e").alias("e2")
    )
    assert a.join(b, "url").filter(F.col("e") != F.col("e2")).count() == 0


def test_url_projections(spark):
    df = spark.createDataFrame(
        [("https://site3.example/p/42",), ("http://x.org",)], "url string"
    )
    rows = df.select(
        url_host(F.col("url")).alias("h"), url_path_depth(F.col("url")).alias("d")
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == ("site3.example", 2)
    assert (rows[1]["h"], rows[1]["d"]) == ("x.org", 0)
