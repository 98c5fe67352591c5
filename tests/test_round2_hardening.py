"""Round-2 hardening tests.

* CC pointer doubling: a planted count-1 symmetric chain far longer than
  the old one-hop-per-iteration bound converges in O(log n) rounds — the
  graft analog of the reference's drained-state assert
  (``lib/markdup_sam.py:208-212``).
* Histogram-native estimators/apportionment: exactly match the per-copy
  implementations on expanded inputs (property-tested).
* Config-aware resume: a checkpoint written under a different DedupConfig
  is recomputed, never silently reused.
* Winnowing density: anchors exist even in adversarial monotone hash runs
  (every s consecutive eligible positions contain >= 1 anchor).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from umi_dedup_spark.config import DedupConfig
from umi_dedup_spark.operators.cc import CCNotConverged, propagate_labels
from umi_dedup_spark.operators.estimators import (
    apportion,
    apportion_hist,
    deduplicate_counts,
    estimate_from_hist,
    ESTIMATORS,
)


# ------------------------------------------------------------- CC chain
def test_cc_long_chain_converges_logarithmically(spark):
    """A 200-node symmetric chain (count-1 families — both edge directions
    satisfy count>=2*count-1) used to need 200 one-hop iterations; pointer
    doubling must finish well within 25 and label every node with the
    chain's best-priority seed (min fam_tb = node 0)."""
    n = 200
    nodes = spark.createDataFrame(
        [(i, 1, i) for i in range(n)], "fam long, fam_count long, fam_tb long"
    )
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    labels, iters = propagate_labels(nodes, edges, max_iters=25)
    got = {r["fam"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert iters <= 12, f"expected O(log n) rounds, got {iters}"


def test_cc_raises_when_budget_too_small(spark):
    n = 40
    nodes = spark.createDataFrame(
        [(i, 1, i) for i in range(n)], "fam long, fam_count long, fam_tb long"
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with pytest.raises(CCNotConverged):
        propagate_labels(nodes, edges, max_iters=2)


# ------------------------------------------- histogram-native estimators
@st.composite
def _hist(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    values = draw(
        st.lists(
            st.integers(min_value=1, max_value=30),
            min_size=n, max_size=n, unique=True,
        )
    )
    mults = draw(
        st.lists(st.integers(min_value=1, max_value=7), min_size=n, max_size=n)
    )
    return np.array(values, dtype=np.int64), np.array(mults, dtype=np.int64)


def _expand(values, mults):
    return np.repeat(values, mults)


@settings(max_examples=200, deadline=None)
@given(_hist(), st.data())
def test_apportion_hist_matches_percopy_multiset(h, data):
    values, mults = h
    counts = _expand(values, mults)
    n, total = len(counts), int(counts.sum())
    target = data.draw(st.integers(min_value=n, max_value=total))

    base, extra = apportion_hist(values, mults, target)
    # expand (keep_base, n_extra) into a per-family multiset per value
    hist_alloc: dict[int, list[int]] = {}
    for v, m, b, e in zip(values, mults, base, extra):
        hist_alloc[int(v)] = [int(b) + 1] * int(e) + [int(b)] * int(m - e)

    percopy = apportion(counts, target)
    percopy_alloc: dict[int, list[int]] = {}
    for c, k in zip(counts, percopy):
        percopy_alloc.setdefault(int(c), []).append(int(k))

    assert int((base * mults + extra).sum()) == target
    for v in hist_alloc:
        assert sorted(hist_alloc[v]) == sorted(percopy_alloc[v]), (
            f"value {v}: {hist_alloc[v]} vs {percopy_alloc[v]}"
        )


@settings(max_examples=100, deadline=None)
@given(_hist(), st.sampled_from(["naive", "weighted_average", "weighted_average2"]))
def test_estimate_from_hist_matches_percopy(h, algorithm):
    values, mults = h
    counts = _expand(values, mults)
    keyspace = 2**20
    want = ESTIMATORS[algorithm](counts, keyspace)
    got = estimate_from_hist(values, mults, keyspace, algorithm)
    assert got == want


def test_estimate_from_hist_cluster_matches_percopy():
    values = np.array([1, 2, 9], dtype=np.int64)
    mults = np.array([5, 3, 2], dtype=np.int64)
    counts = _expand(values, mults)
    want = ESTIMATORS["cluster"](counts, 2**20)
    got = estimate_from_hist(values, mults, 2**20, "cluster")
    assert got == want


# ------------------------------------------------- config-aware resume
def test_resume_rejects_stale_config_checkpoint(spark, tmp_path):
    from umi_dedup_spark.plans.pipeline import DedupPipeline
    from umi_dedup_spark.synth import make_pages

    corpus = make_pages(n_docs=80, seed=5)
    ckpt = str(tmp_path / "ckpt")
    cfg_a = DedupConfig(shuffle_partitions=8)
    DedupPipeline(spark, cfg_a, checkpoint_dir=ckpt).run(corpus.to_spark(spark))

    # different shingle config -> families/pairs written under cfg_a are
    # stale; the resumed run must recompute, not reuse
    import os

    cfg_b = DedupConfig(shuffle_partitions=8, shingle_k=3)
    mtime_before = os.path.getmtime(
        os.path.join(ckpt, "families", "_manifest.json")
    )
    DedupPipeline(spark, cfg_b, checkpoint_dir=ckpt).run(
        corpus.to_spark(spark), resume=True
    )
    mtime_after = os.path.getmtime(
        os.path.join(ckpt, "families", "_manifest.json")
    )
    assert mtime_after > mtime_before, "stale-config checkpoint was reused"


# ------------------------------------------------- winnowing density
def test_winnowing_density_adversarial_runs():
    """Every s consecutive positions contain an anchor, for increasing,
    decreasing, constant, and random hash sequences (a forward-min-only
    rule finds no anchor in a decreasing run; hash%s==0 finds none in a
    constant run)."""
    from umi_dedup_spark.functions.hashing import winnow_anchor_positions

    s = 8
    n = 60
    rng = np.random.RandomState(0)
    seqs = {
        "increasing": np.sort(rng.randint(0, 2**63, n).astype(np.uint64)),
        "decreasing": np.sort(rng.randint(0, 2**63, n).astype(np.uint64))[::-1],
        "constant": np.full(n, 12345, dtype=np.uint64),
        "random": rng.randint(0, 2**63, n).astype(np.uint64),
    }
    for name, th in seqs.items():
        anchors = set(winnow_anchor_positions(np.ascontiguousarray(th), s).tolist())
        assert anchors, f"no anchors in {name} run"
        for start in range(0, n - s + 1):
            assert any(start <= a < start + s for a in anchors), (
                f"{name}: no anchor in window [{start}, {start + s})"
            )


def test_winnowing_matches_bruteforce_argmin():
    """Kernel anchors == the set of per-window argmins (distinct hashes):
    i is selected iff i minimizes at least one s-window covering it."""
    from umi_dedup_spark.functions.hashing import winnow_anchor_positions

    rng = np.random.RandomState(3)
    for _ in range(20):
        n = int(rng.randint(2, 40))
        s = int(rng.randint(2, 10))
        th = np.unique(rng.randint(0, 2**62, size=2 * n).astype(np.uint64))[:n]
        rng.shuffle(th)
        n = len(th)
        # windows starting at every position, tail-truncated (the kernel
        # pads with +inf, i.e. tail windows shrink rather than disappear)
        want = set()
        for j in range(n):
            w = th[j : j + s]
            want.add(j + int(np.argmin(w)))
        got = set(winnow_anchor_positions(th, s).tolist())
        assert got == want, f"n={n} s={s}: {sorted(got)} vs {sorted(want)}"
