"""Property-based kernel checks (hypothesis): the engine's HOF kernels
against an independent numpy implementation — the same
verify-against-independent-math pattern the reference uses
(src/test_hnsw.zig:15-22)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zvdb_spark.functions.vector import cosine_sim, dist_sq, dot, l2_norm

_session = None


def _spark():
    # hypothesis calls the test many times; reuse one session
    global _session
    if _session is None:
        from zvdb_spark.session import get_session

        _session = get_session("prop_tests", cpus=4)
    return _session


finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def vec_pairs(draw):
    dim = draw(st.integers(min_value=1, max_value=32))
    a = draw(st.lists(finite, min_size=dim, max_size=dim))
    b = draw(st.lists(finite, min_size=dim, max_size=dim))
    return a, b


@given(vec_pairs())
@settings(max_examples=20, deadline=None)
def test_dist_sq_matches_numpy(pair):
    a, b = pair
    spark = _spark()
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(dist_sq("a", "b")).head()[0]
    want = float(((np.array(a) - np.array(b)) ** 2).sum())
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9)


@given(vec_pairs())
@settings(max_examples=20, deadline=None)
def test_dot_and_norm_match_numpy(pair):
    a, b = pair
    spark = _spark()
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(dot("a", "b").alias("p"), l2_norm("a").alias("n")).head()
    assert math.isclose(row.p, float(np.dot(a, b)), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(
        row.n, float(np.linalg.norm(a)), rel_tol=1e-9, abs_tol=1e-9
    )


@given(vec_pairs())
@settings(max_examples=15, deadline=None)
def test_cosine_bounded(pair):
    a, b = pair
    spark = _spark()
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    c = df.select(cosine_sim("a", "b")).head()[0]
    if c is not None:
        assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9
