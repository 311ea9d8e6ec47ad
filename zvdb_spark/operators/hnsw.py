"""Partitioned HNSW-style ANN index — the bench-path mirror of the
reference engine, re-shaped for shared-nothing execution.

The reference builds ONE global in-memory graph under a global mutex
(``src/hnsw.zig:44-50``, insert ``:73-117``, search ``:194-236``) and
its own benchmark notes that more cores made it *slower* from lock
contention (``benchmarks/benchmark.md:3-8``). The Spark redesign:

- shard vectors across P partitions by a seeded hash (no coordination);
- build an independent small graph per shard inside one
  ``applyInPandas`` task (numpy, no locks — the shard is private to
  the task, which is what the reference's mutexes were simulating);
- search = probe every shard's graph in parallel (greedy best-first
  over layer-0 edges, mirroring ``src/hnsw.zig:211-224``), then merge
  the per-shard top-k with a global top-k — the distributed version of
  the reference's result heap (``src/hnsw.zig:202``).

Semantics preserved from the reference (each deliberately):
- squared L2 distances, no sqrt           (src/hnsw.zig:191)
- geometric level sampling, capped        (src/hnsw.zig:172-180) —
  but SEEDED (engine rule: no unseeded randomness; the reference's
  CSPRNG at :176 makes its index nondeterministic, flagged in
  SURVEY §2.1 as a deliberate fix)
- greedy single-path descent on insert    (src/hnsw.zig:88-104)
- bidirectional connect + top-M prune     (src/hnsw.zig:119-170)
- search walks layer-0 only               (src/hnsw.zig:216)
- k > N returns N rows; empty -> empty    (src/test_hnsw.zig:104-126)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_LEVEL = 31  # src/hnsw.zig:177 hard cap

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("layer", T.IntegerType()),
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
)

SEARCH_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("dist_sq", T.DoubleType()),
    ]
)


@dataclass
class _ShardGraph:
    """In-task graph state for one shard (the reference's HNSW struct,
    src/hnsw.zig:44-50, minus the locks)."""

    m: int
    levels: dict[int, int]
    adj: dict[tuple[int, int], list[int]]  # (node, layer) -> neighbors
    entry: int | None = None
    max_level: int = 0


def _dist(a: np.ndarray, b: np.ndarray) -> float:
    d = a - b
    return float(d @ d)  # squared L2, src/hnsw.zig:182-192


def _random_level(rng: np.random.Generator) -> int:
    lvl = 0
    while rng.random() < 0.5 and lvl < MAX_LEVEL:  # src/hnsw.zig:172-180
        lvl += 1
    return lvl


def _shrink(g: _ShardGraph, vecs: dict[int, np.ndarray], node: int, layer: int):
    """Top-M prune by distance (src/hnsw.zig:143-170)."""
    nbrs = g.adj.get((node, layer), [])
    if len(nbrs) <= g.m:
        return
    nbrs.sort(key=lambda j: (_dist(vecs[node], vecs[j]), j))
    g.adj[(node, layer)] = nbrs[: g.m]


def _connect(g: _ShardGraph, vecs, a: int, b: int, layer: int):
    """Bidirectional edge add + prune both (src/hnsw.zig:119-141)."""
    g.adj.setdefault((a, layer), []).append(b)
    g.adj.setdefault((b, layer), []).append(a)
    _shrink(g, vecs, a, layer)
    _shrink(g, vecs, b, layer)


def _insert(g: _ShardGraph, vecs, node: int, rng: np.random.Generator):
    """Greedy-descent insert (src/hnsw.zig:73-117)."""
    level = _random_level(rng)
    g.levels[node] = level
    if g.entry is None:
        g.entry = node
        g.max_level = level
        return
    cur = g.entry
    for layer in range(g.max_level, -1, -1):
        # greedy hill-climb toward the new point (src/hnsw.zig:88-104)
        improved = True
        while improved:
            improved = False
            cur_d = _dist(vecs[node], vecs[cur])
            for nbr in g.adj.get((cur, layer), []):
                nd = _dist(vecs[node], vecs[nbr])
                if nd < cur_d:
                    cur, cur_d, improved = nbr, nd, True
        if layer <= level:
            _connect(g, vecs, node, cur, layer)
    if level > g.max_level:  # src/hnsw.zig:114-116
        g.max_level = level
        g.entry = node


def _build_shard(pdf: pd.DataFrame, m: int, seed: int) -> pd.DataFrame:
    pid = int(pdf["pid"].iloc[0])
    order = np.argsort(pdf["vec_id"].to_numpy())  # deterministic insert order
    ids = pdf["vec_id"].to_numpy()[order]
    mat = np.stack(pdf["emb"].to_numpy()[order]).astype(np.float64)
    vecs = {int(i): mat[k] for k, i in enumerate(ids)}
    g = _ShardGraph(m=m, levels={}, adj={})
    rng = np.random.default_rng(seed + pid)
    for i in ids:
        _insert(g, vecs, int(i), rng)
    rows = [
        (pid, layer, src, dst)
        for (src, layer), nbrs in g.adj.items()
        for dst in nbrs
    ]
    return pd.DataFrame(rows, columns=["pid", "layer", "src", "dst"]).astype(
        {"pid": "int32", "layer": "int32", "src": "int64", "dst": "int64"}
    )


def shard_vectors(
    emb: DataFrame, n_partitions: int, id_col: str = "vec_id", vec_col: str = "emb"
) -> DataFrame:
    """Deterministic shard assignment (replaces the reference's global
    id counter under mutex, src/hnsw.zig:77): hash-mod on the id."""
    return emb.withColumn(
        "pid", (F.crc32(F.col(id_col).cast("string")) % n_partitions).cast("int")
    )


def build_hnsw_index(
    emb: DataFrame, n_partitions: int = 32, m: int = 16, seed: int = 42
) -> DataFrame:
    """Bulk index build: one independent graph per shard, built inside
    applyInPandas (Arrow batches, no locks). Returns the edge table
    (pid, layer, src, dst) — the derived-state DataFrame that replaces
    the reference's in-memory adjacency (src/hnsw.zig:15).
    """
    sharded = shard_vectors(emb, n_partitions)
    return sharded.groupBy("pid").applyInPandas(
        lambda pdf: _build_shard(pdf, m=m, seed=seed), EDGE_SCHEMA
    )


def _search_shard(
    vec_pdf: pd.DataFrame,
    edge_pdf: pd.DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
) -> pd.DataFrame:
    """Greedy best-first layer-0 search within one shard
    (src/hnsw.zig:194-236: candidate min-heap, visited set, stop at k)."""
    import heapq

    ids = vec_pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.stack(vec_pdf["emb"].to_numpy()[order]).astype(np.float64)
    pos = {int(i): k_ for k_, i in enumerate(ids)}
    adj: dict[int, list[int]] = {}
    l0 = edge_pdf[edge_pdf["layer"] == 0]
    for s, d in zip(l0["src"].to_numpy(), l0["dst"].to_numpy()):
        adj.setdefault(int(s), []).append(int(d))
    entry = int(ids[0])  # first inserted node (src/hnsw.zig:110-112)
    out = []
    for qi, q in zip(query_ids, queries):
        heap = [(_dist(q, mat[pos[entry]]), entry)]
        visited = {entry}
        results: list[tuple[float, int]] = []
        while heap and len(results) < k:
            d, node = heapq.heappop(heap)
            results.append((d, node))
            for nbr in adj.get(node, []):
                if nbr not in visited:
                    visited.add(nbr)
                    heapq.heappush(heap, (_dist(q, mat[pos[nbr]]), nbr))
        for d, node in sorted(results):
            out.append((int(qi), node, d))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "dist_sq"]).astype(
        {"query_id": "int64", "vec_id": "int64", "dist_sq": "float64"}
    )


def hnsw_search(
    sharded: DataFrame,
    edges: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    query_ids: np.ndarray | None = None,
) -> DataFrame:
    """Distributed ANN search: every shard graph probed in parallel
    (cogrouped applyInPandas over vectors+edges), per-shard top-k,
    global top-k merge — the shared-nothing replacement for the
    reference's serialized search (src/hnsw.zig:195-196 takes the
    global lock per query; here q shards x queries run at once)."""
    if query_ids is None:
        query_ids = np.arange(len(queries))
    qarr = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)

    def _per_shard(key, vec_pdf_iter, edge_pdf_iter):
        return _search_shard(vec_pdf_iter, edge_pdf_iter, qarr, qids, k)

    per_shard = (
        sharded.groupBy("pid")
        .cogroup(edges.groupBy("pid"))
        .applyInPandas(_per_shard, SEARCH_SCHEMA)
    )
    w = W.partitionBy("query_id").orderBy("dist_sq", "vec_id")
    return (
        per_shard.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
