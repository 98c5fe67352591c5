"""Round-4 hardening tests.

* Oracle validity envelope: the end-to-end DuckDB flagship mirror assumes
  every candidate bucket runs all-pairs; `assert_no_bucket_overflow` must
  fire when a hot bucket degraded to star+chain (not mirrored in SQL) and
  stay silent otherwise (VERDICT r3 "What's missing" #2).
* Checkpoint hash-dialect guard: a snapshot written by a build whose
  fingerprint kernel emits different values must not resume even under an
  identical DedupConfig (ADVICE r3, io.py).
* apportion heavy-overshoot regression: one eligible row legitimately
  absorbs several decrements — the heap rewrite must preserve that
  per-step semantics exactly.
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np
import pytest

from umi_dedup_spark import io as dio
from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.operators.estimators import apportion, apportion_hist
from umi_dedup_spark.plans.pipeline import DedupPipeline

TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _near_dup_pages(spark, n_variants: int):
    """n_variants distinct one-token-edit variants of one base doc: each is
    its own exact-family, but they share most LSH band hashes, so every
    shared band forms one bucket of ~n_variants families."""
    base = ("data table query spark shuffle join filter scan batch stream "
            "window group sort merge hash value count index column row "
            "page crawl web text engine cluster node edge graph label") * 3
    rows = []
    for i in range(n_variants):
        toks = base.split()
        toks[7 + i] = f"edit{i}"  # one distinct token per variant
        rows.append((f"https://ex.com/{i}", TS, None, " ".join(toks), "en"))
    # plus a few unrelated singletons so the corpus isn't degenerate
    for i in range(5):
        rows.append(
            (f"https://other.com/{i}", TS, None,
             f"solo document number {i} " + " ".join(f"w{i}x{j}" for j in range(40)),
             "en")
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_overflow_guard_fires_on_hot_bucket(spark):
    pages = _near_dup_pages(spark, 8)
    cfg = DedupConfig(max_bucket_families=3)
    pipe = DedupPipeline(spark, cfg)
    pipe.run(pages)
    assert pipe.metrics_overflow is not None
    assert pipe.metrics_overflow.count() > 0, (
        "fixture failed to produce an oversized bucket"
    )
    with pytest.raises(AssertionError, match="star\\+chain"):
        pipe.assert_no_bucket_overflow()


def test_overflow_guard_silent_when_buckets_fit(spark):
    pages = _near_dup_pages(spark, 8)
    pipe = DedupPipeline(spark, DedupConfig())  # default cap 512
    pipe.run(pages)
    assert pipe.metrics_overflow is not None
    assert pipe.metrics_overflow.count() == 0
    pipe.assert_no_bucket_overflow()  # no raise


def test_stage_complete_rejects_foreign_hash_dialect(spark, tmp_path):
    cfg = DedupConfig()
    path = str(tmp_path / "stage")
    df = spark.range(3).selectExpr("id as norm_hash", "id as fam_count")
    dio.write_table(df, path, stage="families", config=cfg)
    assert dio.stage_complete(path, cfg)
    mf = os.path.join(path, dio.MANIFEST_NAME)
    manifest = json.load(open(mf))
    assert manifest["dialect"]
    manifest["dialect"] = "blake2b-pre-round3"
    json.dump(manifest, open(mf, "w"))
    assert not dio.stage_complete(path, cfg), (
        "checkpoint written under a different fingerprint dialect must be stale"
    )
    # config-less probe (existence only) still sees a complete write
    assert dio.stage_complete(path)


def test_fingerprint_max_tokens_cap(spark):
    # cap semantics: fingerprint(text, cap=N) == fingerprint(first N
    # tokens); cap >= len is the identity
    import pandas as pd

    from umi_dedup_spark.functions.hashing import _fingerprint_batch

    long_doc = " ".join(f"tok{i % 37}x{i % 11}" for i in range(400))
    head = " ".join(long_doc.split()[:100])
    full = pd.Series([long_doc])
    sig_cap, sim_cap, win_cap = _fingerprint_batch(
        full, 5, 64, 42, window_tokens=24, anchor_stride=8, max_tokens=100
    )
    sig_head, sim_head, win_head = _fingerprint_batch(
        pd.Series([head]), 5, 64, 42, window_tokens=24, anchor_stride=8
    )
    assert (sig_cap[0] == sig_head[0]).all()
    assert sim_cap[0] == sim_head[0]
    assert (win_cap[0] == win_head[0]).all()
    sig_id, sim_id, _ = _fingerprint_batch(full, 5, 64, 42, max_tokens=10_000)
    sig_raw, sim_raw, _ = _fingerprint_batch(full, 5, 64, 42)
    assert (sig_id[0] == sig_raw[0]).all() and sim_id[0] == sim_raw[0]


def test_apportion_repeated_decrement_single_eligible_row():
    # ideal = [10, 0.1 x10] -> safe_round floors the ten 0.1s up to 1 each:
    # sum 20 vs target 11, gap -9, and the ONLY row above 1 is row 0 — it
    # must absorb all nine decrements (ends at 1).
    counts = [100] + [1] * 10
    out = apportion(counts, 11)
    assert out.tolist() == [1] + [1] * 10
    assert int(out.sum()) == 11


def test_apportion_matches_hist_on_overshoot_shapes():
    rng = np.random.RandomState(7)
    for _ in range(50):
        n_big = rng.randint(1, 4)
        n_ones = rng.randint(0, 12)
        counts = list(rng.randint(5, 60, size=n_big)) + [1] * n_ones
        counts = [int(c) for c in counts]
        total = sum(counts)
        nz = sum(1 for c in counts if c > 0)
        target = int(rng.randint(nz, total + 1))
        per_copy = apportion(counts, target)
        values, inv = np.unique(np.asarray(counts, dtype=np.int64), return_inverse=True)
        mults = np.bincount(inv).astype(np.int64)
        base, extra = apportion_hist(values, mults, target)
        # allocation multiset per count value must agree between the
        # per-copy and histogram implementations
        for vi, v in enumerate(values):
            got = sorted(int(per_copy[i]) for i in range(len(counts)) if counts[i] == v)
            want = sorted(
                [int(base[vi]) + 1] * int(extra[vi])
                + [int(base[vi])] * (int(mults[vi]) - int(extra[vi]))
            )
            assert got == want, (counts, target, v, got, want)
