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


# ---- edge-cap monotonicity (pure numpy, no Spark) -------------------

edge_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # src
        st.integers(min_value=0, max_value=12),  # dst
        st.sampled_from([0.0, 0.25, 0.5, 1.0, 2.0]),  # score (ties likely)
    ),
    max_size=60,
)


def _as_arrays(edges):
    if not edges:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.float64),
        )
    s, d, c = zip(*edges)
    return (
        np.array(s, np.int64),
        np.array(d, np.int64),
        np.array(c, np.float64),
    )


@given(a=edge_sets, b=edge_sets, two_m=st.integers(min_value=1, max_value=6))
@settings(max_examples=300, deadline=None)
def test_edge_cap_is_monotone(a, b, two_m):
    """cap(cap(A) ∪ B) == cap(A ∪ B): the invariant that lets the
    adjacency merge store CAPPED edge segments and still produce the
    same graph as re-capping the full edge history on every append
    (graph_ann._canonical_capped_edges, used by GraphIndex.state)."""
    from zvdb_spark.operators.graph_ann import _canonical_capped_edges

    sa, da, ca = _as_arrays(a)
    sb, db, cb = _as_arrays(b)
    capped_a = _canonical_capped_edges(sa, da, ca, two_m)
    merged = _canonical_capped_edges(
        np.concatenate([capped_a[0], sb]),
        np.concatenate([capped_a[1], db]),
        np.concatenate([capped_a[2], cb]),
        two_m,
    )
    direct = _canonical_capped_edges(
        np.concatenate([sa, sb]),
        np.concatenate([da, db]),
        np.concatenate([ca, cb]),
        two_m,
    )
    for m_arr, d_arr in zip(merged, direct):
        np.testing.assert_array_equal(m_arr, d_arr)


@given(a=edge_sets, two_m=st.integers(min_value=1, max_value=6))
@settings(max_examples=200, deadline=None)
def test_edge_cap_canonical_invariants(a, two_m):
    """Output is (src,dst)-unique, degree-capped at two_m, and
    idempotent under re-canonicalization."""
    from zvdb_spark.operators.graph_ann import _canonical_capped_edges

    s, d, c = _as_arrays(a)
    cs, cd, cc = _canonical_capped_edges(s, d, c, two_m)
    pairs = list(zip(cs.tolist(), cd.tolist()))
    assert len(pairs) == len(set(pairs))
    for deg in np.bincount(cs, minlength=1) if len(cs) else []:
        assert deg <= two_m
    again = _canonical_capped_edges(cs, cd, cc, two_m)
    for x, y in zip(again, (cs, cd, cc)):
        np.testing.assert_array_equal(x, y)


# --- hot-bucket-bounded band self-join (operators/banding.py) ---

memberships = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 4)),
    min_size=0,
    max_size=100,
    unique=True,
)


@given(rows=memberships, cap=st.integers(1, 20), s=st.integers(1, 6))
@settings(max_examples=12, deadline=None)
def test_bounded_band_pairs_matches_naive_clique(rows, cap, s):
    """At ANY (membership table, cap, n_salts) the emitted pair set
    equals the naive per-bucket clique — the invariant that makes the
    hot-bucket bound safe to leave on everywhere."""
    import itertools

    from zvdb_spark.operators.banding import bounded_band_pairs

    spark = _spark()
    df = spark.createDataFrame(rows, "rid long, key long") if rows else (
        spark.createDataFrame([], "rid long, key long")
    )
    got = {
        (r.ia, r.ib)
        for r in bounded_band_pairs(
            df, "rid", ["key"], cap=cap, n_salts=s
        ).collect()
    }
    buckets: dict[int, list[int]] = {}
    for rid, key in rows:
        buckets.setdefault(key, []).append(rid)
    want = {
        p
        for ids in buckets.values()
        for p in itertools.combinations(sorted(ids), 2)
    }
    assert got == want
