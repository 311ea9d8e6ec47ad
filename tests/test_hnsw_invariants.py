"""Invariants ported from the reference's own test suite
(src/test_hnsw.zig, mapped in FIXTURES.md §A) onto the partitioned
HNSW-mirror operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zvdb_spark.functions.vector import as_double_array
from zvdb_spark.operators.hnsw import build_hnsw_index, hnsw_search, shard_vectors
from zvdb_spark.sources.tables import load


def _mk(spark, vectors):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vectors)]
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def _search(spark, corpus, queries, k, n_partitions=2, seed=42):
    sharded = shard_vectors(corpus, n_partitions).localCheckpoint(eager=True)
    edges = build_hnsw_index(corpus, n_partitions, m=16, seed=seed)
    return hnsw_search(sharded, edges, np.asarray(queries, dtype=np.float64), k=k)


def test_basic_functionality(spark):
    """3 points, k=2: 2 results ascending by true distance
    (src/test_hnsw.zig:24-41)."""
    corpus = _mk(spark, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    res = _search(spark, corpus, [[3, 4, 5]], k=2).collect()
    assert len(res) == 2
    dists = [r.dist_sq for r in sorted(res, key=lambda r: r.dist_sq)]
    assert dists == sorted(dists)
    assert res[0].vec_id in (0, 1)  # the two nearest of the three


def test_empty_index(spark):
    """Search on empty corpus -> 0 rows, no error
    (src/test_hnsw.zig:43-53)."""
    corpus = spark.createDataFrame([], "vec_id long, emb array<double>")
    assert _search(spark, corpus, [[1.0, 2.0, 3.0]], k=5).count() == 0


def test_single_point_self_match(spark):
    """Exact self-match returned (src/test_hnsw.zig:55-68)."""
    corpus = _mk(spark, [[1, 2, 3]])
    res = _search(spark, corpus, [[1, 2, 3]], k=1).collect()
    assert len(res) == 1 and res[0].dist_sq == 0.0


def test_duplicates_and_k_clamp(spark):
    """Duplicate points are distinct rows; k > N returns N
    (src/test_hnsw.zig:104-126)."""
    corpus = _mk(spark, [[1, 2, 3], [1, 2, 3]])
    res = _search(spark, corpus, [[1, 2, 3]], k=100).collect()
    assert len(res) == 2
    assert {r.vec_id for r in res} == {0, 1}
    assert all(r.dist_sq == 0.0 for r in res)


def test_consistency_fixed_seed(spark, sf_dir):
    """Same query on the same seeded index -> identical results
    (src/test_hnsw.zig:275-316; seeding replaces the reference's
    CSPRNG at src/hnsw.zig:176)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    q = np.asarray(e.filter(F.col("vec_id") == 0).head()[1])
    r1 = sorted(map(tuple, _search(spark, e, [q], k=10, n_partitions=4).collect()))
    r2 = sorted(map(tuple, _search(spark, e, [q], k=10, n_partitions=4).collect()))
    assert r1 == r2


def test_row_conservation_after_sharding(spark, sf_dir):
    """Partitioned ingest conserves rows — the Concurrent Access
    analog (src/test_hnsw.zig:154-209: 8 writers x 1000 -> 8000)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    n = e.count()
    sharded = shard_vectors(e, 8)
    assert sharded.count() == n
    assert sharded.select("vec_id").distinct().count() == n
    # every shard's graph only references its own nodes
    edges = build_hnsw_index(e, 8, seed=42)
    joined = edges.join(
        sharded.select("vec_id", F.col("pid").alias("vpid")),
        edges.src == F.col("vec_id"),
    )
    assert joined.filter(F.col("pid") != F.col("vpid")).count() == 0


def test_recall_vs_exact(spark, sf_dir):
    """ANN recall@10 against the exact oracle — the analog of the
    reference verifying search against an independent Euclidean
    implementation (src/test_hnsw.zig:15-22)."""
    from zvdb_spark.functions.vector import dist_sq

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    q = np.asarray(e.filter(F.col("vec_id") == 0).head()[1])
    ann = {r.vec_id for r in _search(spark, e, [q], k=10, n_partitions=4).collect()}
    qcol = F.array(*[F.lit(float(x)) for x in q]).cast("array<double>")
    exact = {
        r.vec_id
        for r in e.withColumn("d", dist_sq("emb", qcol))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    recall = len(ann & exact) / 10
    assert recall >= 0.3, f"recall@10 = {recall}"


def test_exactly_k_results_per_query(spark, sf_dir):
    """Batched queries always return exactly k rows each, self-match
    first (src/test_hnsw.zig:211-237 stress invariant; ordering is
    carried by dist_sq, not row order, in DataFrame semantics)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    first = e.orderBy("vec_id").limit(3).collect()
    qs = np.stack([np.asarray(r.emb) for r in first])
    qids = np.array([r.vec_id for r in first])
    res = hnsw_search(
        shard_vectors(e, 4).localCheckpoint(eager=True),
        build_hnsw_index(e, 4, seed=42),
        qs,
        k=10,
        query_ids=qids,
    ).toPandas()
    for qid, grp in res.groupby("query_id"):
        assert len(grp) == 10
        # the query point itself is in the corpus -> dist 0 present
        assert grp["dist_sq"].min() == 0.0
        assert int(grp.loc[grp["dist_sq"].idxmin(), "vec_id"]) == qid
