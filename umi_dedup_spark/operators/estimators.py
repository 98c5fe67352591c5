"""Statistical duplicate-count estimators (SURVEY.md §2.6, E1-E5).

Independent reimplementations of the *semantics* of the reference's four
per-group survivor-count estimators and the apportionment step:

* E1 naive                 (``lib/naive_estimate.py:11-12``)
* E2 weighted_average      (``lib/weighted_average.py:6-15``)
* E3 weighted_average2     (``lib/weighted_average2.py:7-26``)
* E4 cluster / Poisson mix (``lib/poisson_mixture.py:115-202``) — same
  model (Poisson mixture, BIC selection over k=1..kmax, rank-of-lambda
  survivor weighting, [naive, total] clamp, max-count==1 shortcut), fitted
  with standard EM instead of the reference's quasi-Newton QN1
  acceleration (documented divergence: same fixpoint, different path).
* E5 apportion_counts      (``lib/apportion_counts.py:12-44``) — exact
  semantics: proportional ideal, >=1 floor for nonzero counts, residual-
  driven +/-1 adjustment, sum conservation asserted.

All are pure numpy functions over a group's count histogram — the Spark
integration runs them per cluster inside ``applyInPandas``
(embarrassingly parallel, no cross-group state). The "unobserved keyspace"
term |alphabet|^L (``lib/umi_data.py:49-50``) is the ``keyspace`` arg —
a config constant here, since 2^64 fingerprint space is meaningless
(SURVEY.md §7 hard parts).

The scope of one estimator call = one near-dup cluster (the merged parent
key after relabeling, ``lib/markdup_sam.py:179-193``), histogram = exact-
family sizes within the cluster.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- E5
def apportion(counts: list[int] | np.ndarray, target: int) -> np.ndarray:
    """Distribute ``target`` across ``counts`` proportionally.

    Invariants (reference asserts, promoted to exceptions here):
    sum(result) == target; every nonzero count keeps >= 1;
    requires n_nonzero <= target <= sum(counts).
    """
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    n_nonzero = int((counts > 0).sum())
    if not (n_nonzero <= target <= total):
        raise ValueError(f"target {target} outside [{n_nonzero}, {total}]")

    ideal = counts * (target / total)
    # safe_round: anything in (0,1) floors up to 1; else banker's round
    result = np.array(
        [1 if 0 < x < 1 else int(round(x)) for x in ideal], dtype=np.int64
    )
    residual = result - ideal  # positive => over-allocated
    gap = target - int(result.sum())

    while gap > 0:  # under-allocated: bump the most-under row
        i = int(np.argmin(residual))
        result[i] += 1
        residual[i] += 1
        gap -= 1
    if gap < 0:
        # never shrink a row at (or below) 1
        residual = np.where(result <= 1, -np.inf, residual)
        while gap < 0:
            i = int(np.argmax(residual))
            result[i] -= 1
            residual[i] = -np.inf if result[i] == 1 else residual[i] - 1
            gap += 1
    assert int(result.sum()) == target
    return result


# ---------------------------------------------------------------- E1
def estimate_naive(counts: np.ndarray, keyspace: int) -> int:
    """One survivor per observed key."""
    return int((np.asarray(counts) > 0).sum())


# ---------------------------------------------------------------- E2
def estimate_weighted_average(counts: np.ndarray, keyspace: int) -> int:
    """Weighted average of n_observed and total, weighted by the
    unobserved-keyspace size vs the number of singletons."""
    counts = np.asarray(counts, dtype=np.int64)
    nz = counts[counts > 0]
    n_obs = len(nz)
    total = int(nz.sum())
    c0 = keyspace - n_obs
    c1 = int((nz == 1).sum())
    if c0 + c1 == 0:
        return n_obs
    return int(round((c0 * n_obs + c1 * total) / (c0 + c1)))


# ---------------------------------------------------------------- E3
def estimate_weighted_average2(counts: np.ndarray, keyspace: int) -> int:
    """Each observed count value votes for truncating every count at
    (itself + 1); votes weighted by the count-value frequencies including
    the inferred zero class."""
    counts = np.asarray(counts, dtype=np.int64)
    nz = counts[counts > 0]
    freq = Counter(int(c) for c in nz)
    n_umi = keyspace
    freq[0] = n_umi - len(nz)
    values = sorted(freq)

    weighted = 0.0
    for ci, fi in freq.items():
        n_seen = trunc_sum = 0
        for cj in values:
            if cj > ci:
                break
            n_seen += freq[cj]
            trunc_sum += cj * freq[cj]
        trunc_sum += (ci + 1) * (n_umi - n_seen)
        weighted += fi * trunc_sum
    return int(round(weighted / n_umi))


# ---------------------------------------------------------------- E4
def _poisson_log_pmf(obs: np.ndarray, lam: np.ndarray) -> np.ndarray:
    """log P(obs | lam) matrix, shape (n_bins, k)."""
    lg = np.array([math.lgamma(x + 1) for x in obs])
    return (
        obs[:, None] * np.log(lam)[None, :] - lam[None, :] - lg[:, None]
    )


def _fit_poisson_mixture(
    freq: np.ndarray, obs: np.ndarray, k: int, max_iter: int = 500, tol: float = 1e-6
) -> tuple[np.ndarray, np.ndarray, float]:
    """Standard EM fit of a k-component Poisson mixture to a histogram.

    freq[i] observations of value obs[i]. Returns (pi, lam, bic).
    """
    n = float(freq.sum())
    pi = np.full(k, 1.0 / k)
    lam = np.arange(1, k + 1, dtype=np.float64)
    ll_prev = -np.inf
    for _ in range(max_iter):
        logp = _poisson_log_pmf(obs, lam) + np.log(pi)[None, :]
        m = logp.max(axis=1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(logp - m).sum(axis=1))
        resp = np.exp(logp - lse[:, None])  # (n_bins, k)
        ll = float((freq * lse).sum())
        w = resp * freq[:, None]
        comp_n = w.sum(axis=0)
        pi = np.maximum(comp_n / n, 1e-12)
        lam = np.maximum((w * obs[:, None]).sum(axis=0) / np.maximum(comp_n, 1e-12), 1e-9)
        if abs(ll - ll_prev) < tol:
            break
        ll_prev = ll
    bic = -2.0 * ll + (2 * k - 1) * math.log(n)
    return pi, lam, bic


def estimate_poisson_cluster(counts: np.ndarray, keyspace: int, kmax: int = 10) -> int:
    """BIC-selected Poisson-mixture estimate of the number of distinct
    molecules. Same decision structure as the reference's dedup_cluster:
    shortcut if max count == 1; fall back to naive when the histogram has
    <= 2 distinct values; clamp to [naive, total]."""
    counts = np.asarray(counts, dtype=np.int64)
    nz = counts[counts > 0]
    if len(nz) == 0:
        return 0
    naive = len(nz)
    total = int(nz.sum())
    if nz.max() == 1:
        return naive
    hist = Counter(int(c) for c in nz)
    hist[0] = keyspace - naive
    obs = np.array(sorted(hist), dtype=np.float64)
    freq = np.array([hist[int(o)] for o in obs], dtype=np.float64)
    if len(obs) <= 2:
        return naive

    fits = [
        _fit_poisson_mixture(freq, obs, k)
        for k in range(1, min(kmax, len(obs)) + 1)
    ]
    pi, lam, _ = min(fits, key=lambda t: t[2])
    rank = np.argsort(lam)  # component -> molecule-count rank (reference rule)
    logp = _poisson_log_pmf(obs, lam) + np.log(np.maximum(pi, 1e-300))[None, :]
    assign = logp.argmax(axis=1)
    est = 0.0
    for i in range(len(obs)):
        if obs[i] == 0:
            continue
        est += float(rank[assign[i]]) * freq[i]
    return int(min(max(round(est), naive), total))


ESTIMATORS = {
    "naive": estimate_naive,
    "weighted_average": estimate_weighted_average,
    "weighted_average2": estimate_weighted_average2,
    "cluster": estimate_poisson_cluster,
}


def deduplicate_counts(
    counts: np.ndarray, keyspace: int, algorithm: str = "naive", kmax: int = 10
) -> np.ndarray:
    """Estimate survivors then apportion across observed counts —
    the full E1-E5 chain for one group."""
    counts = np.asarray(counts, dtype=np.int64)
    if algorithm == "cluster":
        target = estimate_poisson_cluster(counts, keyspace, kmax)
    else:
        target = ESTIMATORS[algorithm](counts, keyspace)
    nz_mask = counts > 0
    target = int(min(max(target, int(nz_mask.sum())), int(counts.sum())))
    out = np.zeros_like(counts)
    out[nz_mask] = apportion(counts[nz_mask], target)
    return out


def cluster_survivor_counts(
    clustered_fams: DataFrame,
    algorithm: str,
    keyspace: int,
    kmax: int = 10,
) -> DataFrame:
    """Per-cluster estimator via applyInPandas: input one row per family
    (cluster_id, norm_hash, fam_count); output adds n_keep per family.

    Shuffle on cluster_id only; each group is a few rows (families per
    cluster), so the pandas path is trivially bounded.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = deduplicate_counts(
            pdf["fam_count"].to_numpy(), keyspace, algorithm, kmax
        )
        return pdf.assign(n_keep=out.astype("int64"))

    schema = "cluster_id long, norm_hash long, fam_count long, n_keep long"
    return (
        clustered_fams.select("cluster_id", "norm_hash", "fam_count")
        .groupBy("cluster_id")
        .applyInPandas(run, schema=schema)
    )
