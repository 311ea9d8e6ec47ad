"""Reusable k-NN operators — the engine's public similarity-search
API (the reference's ``search``, ``src/hnsw.zig:194-236``, as a
DataFrame operator).

``knn_join`` is the general form: every row of ``queries`` matched to
its k nearest ``corpus`` rows. The exact path is a crossJoin + window
top-k (quadratic by contract); callers at scale pass a blocked/
bucketed candidate pair frame instead (see operators/ann.py) — the
ranking code is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.functions.vector import cosine_sim, dist_sq


def _score(metric: str, a: str, b: str) -> tuple[Column, bool]:
    """Return (score column, ascending?) for a metric name."""
    if metric == "l2_sq":
        return dist_sq(a, b), True
    if metric == "cosine":
        return cosine_sim(a, b), False
    raise ValueError(f"unknown metric {metric!r}; use 'l2_sq' or 'cosine'")


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2_sq",
    corpus_id: str = "vec_id",
    corpus_vec: str = "emb",
    query_id: str = "query_id",
    query_vec: str = "qemb",
) -> DataFrame:
    """Exact batched k-NN: (query_id, neighbor_id, score, rn) with
    rn in 1..k per query, deterministic tie-break on neighbor id.

    Mirrors the reference's search contract: k > N returns N rows
    (src/test_hnsw.zig:121-125), empty corpus returns empty
    (src/test_hnsw.zig:43-53), ties broken by id for determinism
    (src/test_hnsw.zig:275-316 consistency test).
    """
    score, asc = _score(metric, corpus_vec, query_vec)
    ordering = [F.col("score").asc() if asc else F.col("score").desc(),
                F.col("neighbor_id").asc()]
    w = W.partitionBy(query_id).orderBy(*ordering)
    pairs = queries.crossJoin(corpus).select(
        F.col(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        score.alias("score"),
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def knn_single(
    corpus: DataFrame,
    query_vec_lit: list[float],
    k: int,
    metric: str = "l2_sq",
    corpus_id: str = "vec_id",
    corpus_vec: str = "emb",
) -> DataFrame:
    """Single-probe k-NN (the reference's exact ``search`` signature):
    one literal query vector against the corpus. Plan: scan ->
    TakeOrderedAndProject; O(N) work, no shuffle."""
    qcol = F.array(*[F.lit(float(x)) for x in query_vec_lit]).cast("array<double>")
    score, asc = _score(metric, corpus_vec, "q")
    df = corpus.withColumn("q", qcol).select(
        F.col(corpus_id).alias("neighbor_id"), score.alias("score")
    )
    ordering = [F.col("score").asc() if asc else F.col("score").desc(),
                F.col("neighbor_id").asc()]
    return df.orderBy(*ordering).limit(k)


def _topk_by_dist_id(d, ids, kk: int):
    """Per-row indices of the kk smallest (distance, id) pairs.

    argpartition fast path; when ties straddle the k-th boundary the
    affected rows are re-resolved exactly by (distance, id) lexsort,
    so shard-level membership matches the declared
    ``ORDER BY d, neighbor_id`` contract even with duplicate vectors
    (duplicates are distinct rows, src/test_hnsw.zig:104-119).
    """
    import numpy as np

    if kk >= d.shape[1]:
        return np.broadcast_to(np.arange(d.shape[1]), d.shape).copy()
    part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
    boundary = np.take_along_axis(d, part, axis=1).max(axis=1)
    ambiguous = np.nonzero((d <= boundary[:, None]).sum(axis=1) > kk)[0]
    for r in ambiguous:
        cand = np.nonzero(d[r] <= boundary[r])[0]
        order = np.lexsort((ids[cand], d[r, cand]))
        part[r] = cand[order[:kk]]
    return part


def exact_search_partitioned(
    sharded: DataFrame,
    queries,
    k: int = 10,
    query_ids=None,
    dtype: str = "float32",
    chunk: int = 2048,
) -> DataFrame:
    """Exact batched k-NN at scale: per-shard vectorized top-k
    (numpy matmul over the Arrow batch — the columnar/SIMD execution
    the reference lists as future work, benchmarks/benchmark.md:37-47)
    followed by a global per-query top-k merge.

    Work: each shard computes distances query-batch x shard-matrix in
    one BLAS call and keeps only k rows per query, so the shuffle
    carries P*k rows per query, never the corpus. This is the pattern
    that holds at 100 TB: shard-local heaps + k-row merge, identical
    to the reference's heap+merge (src/hnsw.zig:202) but shared-nothing.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if query_ids is None:
        query_ids = np.arange(len(queries))
    np_dtype = np.dtype(dtype)  # f32 default: the reference's element
    # type (benchmarks use f32 vectors) — half the memory traffic of f64
    qarr = np.ascontiguousarray(np.asarray(queries, dtype=np_dtype))
    qids = np.asarray(query_ids, dtype=np.int64)
    qnorm = (qarr.astype(np.float64) ** 2).sum(axis=1).astype(np_dtype)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def _shard_topk(pdf: pd.DataFrame):
        ids = pdf["vec_id"].to_numpy()
        mat = np.ascontiguousarray(np.stack(pdf["emb"].to_numpy()).astype(np_dtype))
        xnorm = (mat.astype(np.float64) ** 2).sum(axis=1).astype(np_dtype)
        kk = min(k, mat.shape[0])
        outs = []
        # chunked GEMM: bounds the distance-matrix working set to
        # chunk x |shard| so it stays cache/memory friendly
        for lo in range(0, len(qarr), chunk):
            qc = qarr[lo : lo + chunk]
            # ||q - x||^2 = ||q||^2 + ||x||^2 - 2 q.x (one GEMM per chunk)
            d = qnorm[lo : lo + chunk, None] + xnorm[None, :] - 2.0 * (qc @ mat.T)
            part = _topk_by_dist_id(d, ids, kk)
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(qids[lo : lo + chunk], kk),
                        "neighbor_id": ids[part.ravel()],
                        "score": np.take_along_axis(d, part, axis=1)
                        .ravel()
                        .astype(np.float64),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    per_shard = sharded.groupBy("pid").applyInPandas(
        lambda pdf: _shard_topk(pdf), schema
    )
    w = W.partitionBy("query_id").orderBy("score", "neighbor_id")
    return (
        per_shard.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def threshold_join_partitioned(
    sharded: DataFrame,
    queries,
    query_ids,
    tau: float,
    metric: str = "l2_sq",
    upper_only: bool = False,
    chunk: int = 2048,
) -> DataFrame:
    """All-pairs similarity join under a threshold, vectorized: each
    shard computes probe-block x shard distances in one GEMM and emits
    only pairs passing the threshold — no candidate materialization,
    no global merge stage (the filter is final).

    metric 'l2_sq' keeps pairs with dist_sq < tau; 'cosine' keeps
    pairs with cosine >= tau. upper_only emits only neighbor_id >
    query_id (unordered-pair form). float64 GEMM: the 1e-15
    accumulation difference vs the HOF kernel is far below any
    sensible threshold margin.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qarr = np.ascontiguousarray(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qnorm = (qarr * qarr).sum(axis=1)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def _shard_pairs(pdf: pd.DataFrame):
        ids = pdf["vec_id"].to_numpy()
        mat = np.ascontiguousarray(np.stack(pdf["emb"].to_numpy()).astype(np.float64))
        xnorm = (mat * mat).sum(axis=1)
        outs = []
        for lo in range(0, len(qarr), chunk):
            qc, qn, qi = qarr[lo : lo + chunk], qnorm[lo : lo + chunk], qids[lo : lo + chunk]
            g = qc @ mat.T
            if metric == "l2_sq":
                score = qn[:, None] + xnorm[None, :] - 2.0 * g
                mask = score < tau
            else:  # cosine
                denom = np.sqrt(qn)[:, None] * np.sqrt(xnorm)[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    score = np.where(denom > 0, g / denom, np.nan)
                mask = score >= tau
            if upper_only:
                mask &= ids[None, :] > qi[:, None]
            r, c = np.nonzero(mask)
            outs.append(
                pd.DataFrame(
                    {"query_id": qi[r], "neighbor_id": ids[c], "score": score[r, c]}
                )
            )
        return pd.concat(outs, ignore_index=True)

    return sharded.groupBy("pid").applyInPandas(lambda p: _shard_pairs(p), schema)
