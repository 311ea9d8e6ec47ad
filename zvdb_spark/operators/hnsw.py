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
    src/hnsw.zig:44-50, minus the locks). Nodes are matrix positions."""

    m: int
    mat: np.ndarray
    adj: dict[tuple[int, int], list[int]]  # (pos, layer) -> neighbor pos
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


def _dists_to(g: _ShardGraph, node: int, others: list[int]) -> np.ndarray:
    diff = g.mat[others] - g.mat[node]
    return np.einsum("ij,ij->i", diff, diff)


def _shrink(g: _ShardGraph, node: int, layer: int):
    """Top-M prune by distance (src/hnsw.zig:143-170), vectorized."""
    nbrs = g.adj.get((node, layer), [])
    if len(nbrs) <= g.m:
        return
    d = _dists_to(g, node, nbrs)
    keep = np.lexsort((nbrs, d))[: g.m]
    g.adj[(node, layer)] = [nbrs[i] for i in keep]


def _connect(g: _ShardGraph, a: int, b: int, layer: int):
    """Bidirectional edge add + prune both (src/hnsw.zig:119-141)."""
    g.adj.setdefault((a, layer), []).append(b)
    g.adj.setdefault((b, layer), []).append(a)
    _shrink(g, a, layer)
    _shrink(g, b, layer)


def _insert(g: _ShardGraph, node: int, rng: np.random.Generator):
    """Greedy-descent insert (src/hnsw.zig:73-117), with each layer's
    neighbor evaluation vectorized (one numpy batch per hill-climb
    step instead of a scalar loop).

    Deviation from the reference, deliberate: the reference connects
    the new node to only the single descent endpoint per layer
    (src/hnsw.zig:106-108), which yields a near-tree layer-0 graph and
    ~1% search recall. We connect to the top-M candidates among the
    endpoint and its neighborhood (whose distances the descent already
    computed) — the standard HNSW neighbor-selection step, restoring
    M-degree navigability at no extra distance evaluations."""
    level = _random_level(rng)
    if g.entry is None:
        g.entry = node
        g.max_level = level
        return
    cur = g.entry
    cur_d = _dist(g.mat[node], g.mat[cur])
    for layer in range(g.max_level, -1, -1):
        # greedy hill-climb toward the new point (src/hnsw.zig:88-104)
        while True:
            nbrs = g.adj.get((cur, layer), [])
            if not nbrs:
                break
            d = _dists_to(g, node, nbrs)
            j = int(np.argmin(d))
            if d[j] < cur_d:
                cur, cur_d = nbrs[j], float(d[j])
            else:
                break
        if layer <= level:
            cands = list({cur, *g.adj.get((cur, layer), [])} - {node})
            d = _dists_to(g, node, cands)
            best = np.lexsort((cands, d))[: g.m]
            for i in best:
                _connect(g, node, cands[i], layer)
    if level > g.max_level:  # src/hnsw.zig:114-116
        g.max_level = level
        g.entry = node


def _build_shard(pdf: pd.DataFrame, m: int, seed: int) -> pd.DataFrame:
    pid = int(pdf["pid"].iloc[0])
    order = np.argsort(pdf["vec_id"].to_numpy())  # deterministic insert order
    ids = pdf["vec_id"].to_numpy()[order]
    mat = np.ascontiguousarray(
        np.stack(pdf["emb"].to_numpy()[order]).astype(np.float64)
    )
    g = _ShardGraph(m=m, mat=mat, adj={})
    rng = np.random.default_rng(seed + pid)
    for p in range(len(ids)):
        _insert(g, p, rng)
    rows = [
        (pid, layer, int(ids[src]), int(ids[dst]))
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
    ef: int = 64,
) -> pd.DataFrame:
    """Greedy best-first layer-0 search within one shard
    (src/hnsw.zig:194-236: candidate min-heap, visited set).

    Deviations from the reference, each deliberate:
    - the reference stops after popping exactly k candidates
      (src/hnsw.zig:211) — a k-node walk from the entry point that
      measures ~1% recall@10 on random 128-d data; we use an
      exploration budget ``ef >= k`` and return the best k explored;
    - the frontier expands as a vectorized BEAM (all beam nodes'
      neighborhoods evaluated in one numpy batch per step) instead of
      a scalar pop-one-push-many heap loop — same explored set shape,
      ~10 numpy calls per query instead of thousands of heap ops.
      This is the batch/SIMD execution the reference's roadmap calls
      for (benchmarks/benchmark.md:37-47)."""
    ids = vec_pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.ascontiguousarray(
        np.stack(vec_pdf["emb"].to_numpy()[order]).astype(np.float64)
    )
    n = len(ids)
    pos = {int(i): k_ for k_, i in enumerate(ids)}
    # adjacency as position arrays: one vectorized distance evaluation
    # per frontier pop (the reference evaluates neighbors one by one,
    # src/hnsw.zig:218-223; batching them is the SIMD twin)
    adj_pos: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(n)]
    l0 = edge_pdf[edge_pdf["layer"] == 0]
    if len(l0):
        src_pos = np.fromiter(
            (pos[int(s)] for s in l0["src"].to_numpy()), dtype=np.int64
        )
        dst_pos = np.fromiter(
            (pos[int(d)] for d in l0["dst"].to_numpy()), dtype=np.int64
        )
        o = np.argsort(src_pos, kind="stable")
        src_pos, dst_pos = src_pos[o], dst_pos[o]
        bounds = np.searchsorted(src_pos, np.arange(n + 1))
        for j in range(n):
            adj_pos[j] = dst_pos[bounds[j] : bounds[j + 1]]
    entry_pos = 0  # first inserted node (src/hnsw.zig:110-112)
    budget = max(ef, k)
    beam_width = max(4, budget // 8)
    # exploration budget: ef beam-node expansions per query
    max_steps = max(2, budget // beam_width)
    nq = len(queries)
    out_q: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    qmat = np.ascontiguousarray(np.asarray(queries, dtype=np.float64))

    # pad adjacency into an (n, maxdeg) matrix with sentinel n so the
    # whole query batch gathers neighbors in one indexing op per step
    maxdeg = max((len(a) for a in adj_pos), default=0) or 1
    adj_mat = np.full((n + 1, maxdeg), n, dtype=np.int64)
    for j, a in enumerate(adj_pos):
        adj_mat[j, : len(a)] = a

    # process queries in fixed-size blocks: bounds the visited matrix
    # and the per-step sort working set so throughput stays flat as
    # the query batch grows
    qblock = 1024
    for blo in range(0, nq, qblock):
        qmb = qmat[blo : blo + qblock]
        qib = query_ids[blo : blo + qblock]
        nb = len(qmb)
        visited = np.zeros((nb, n + 1), dtype=bool)
        visited[:, entry_pos] = True
        visited[:, n] = True  # sentinel never expands
        d0 = qmb - mat[entry_pos]
        acc_q = [np.arange(nb, dtype=np.int64)]
        acc_p = [np.full(nb, entry_pos, dtype=np.int64)]
        acc_d = [np.einsum("ij,ij->i", d0, d0)]
        beam = np.full((nb, beam_width), n, dtype=np.int64)
        beam[:, 0] = entry_pos
        active = np.ones(nb, dtype=bool)
        for _ in range(max_steps):
            if not active.any():
                break
            aq = np.nonzero(active)[0]
            cand = adj_mat[beam[aq]].reshape(len(aq), -1)  # (A, B*maxdeg)
            qidx = np.repeat(aq, cand.shape[1])
            cand_flat = cand.ravel()
            m = ~visited[qidx, cand_flat]
            qidx, cand_flat = qidx[m], cand_flat[m]
            if not len(qidx):
                break
            # intra-step dedupe per (query, node)
            key = qidx * (n + 1) + cand_flat
            _, uniq = np.unique(key, return_index=True)
            qidx, cand_flat = qidx[uniq], cand_flat[uniq]
            visited[qidx, cand_flat] = True
            diff = mat[cand_flat] - qmb[qidx]
            dists = np.einsum("ij,ij->i", diff, diff)
            acc_q.append(qidx)
            acc_p.append(cand_flat)
            acc_d.append(dists)
            # next beam: best beam_width fresh candidates per query
            # (vectorized fill: rank-within-group < beam_width)
            order = np.lexsort((cand_flat, dists, qidx))
            qs_, ps_ = qidx[order], cand_flat[order]
            starts = np.searchsorted(qs_, np.arange(nb + 1))
            rank = np.arange(len(qs_)) - starts[qs_]
            keep = rank < beam_width
            beam = np.full((nb, beam_width), n, dtype=np.int64)
            beam[qs_[keep], rank[keep]] = ps_[keep]
            active = np.zeros(nb, dtype=bool)
            active[qs_] = True
        pall = np.concatenate(acc_p)
        dall = np.concatenate(acc_d)
        qall = np.concatenate(acc_q)
        order = np.lexsort((pall, dall, qall))
        qs_, ps_, ds_ = qall[order], pall[order], dall[order]
        starts = np.searchsorted(qs_, np.arange(nb + 1))
        for qi2 in range(nb):
            lo = starts[qi2]
            hi = min(starts[qi2 + 1], lo + k)
            out_q.append(np.full(hi - lo, qib[qi2], dtype=np.int64))
            out_v.append(ids[ps_[lo:hi]])
            out_d.append(ds_[lo:hi])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q) if out_q else [],
            "vec_id": np.concatenate(out_v) if out_v else [],
            "dist_sq": np.concatenate(out_d) if out_d else [],
        }
    )


def hnsw_search(
    sharded: DataFrame,
    edges: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    query_ids: np.ndarray | None = None,
    ef: int = 64,
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
        return _search_shard(vec_pdf_iter, edge_pdf_iter, qarr, qids, k, ef=ef)

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
