"""Cell-blocked navigable kNN-graph ANN index — the engine's
graph-search path (round-2 redesign of the greedy-insert mirror in
operators/hnsw.py).

The reference accelerates search with a navigable graph built by
incremental greedy insertion (``src/hnsw.zig:73-117``) and searched
best-first over layer-0 edges (``src/hnsw.zig:194-236``). This
redesign keeps the search semantics (best-first frontier over an
M-degree graph, squared L2, ≤ k results ascending, k > N clamps,
deterministic ties) but restructures build and routing around a
coarse quantizer, because that is what measured well:

- **cells**: seeded k-means cells (~``cell_target_rows`` rows each)
  quantize the corpus. One shuffle to assign; centroids are k x dim
  driver-side index metadata (like the reference's entry_point
  scalar, ``src/hnsw.zig:46``).
- **build**: each node's M nearest are searched only among its cell
  and the R-1 nearest cells (cell-blocked blocked-GEMM kNN — the
  fraction ~R/C of the exact N² work), then edges are symmetrized
  and degree-capped at 2M by a window — the distributed connect +
  shrink (``src/hnsw.zig:119-170``). Every step is a DataFrame op.
- **search**: a query seeds its beam from ``seeds_per_cell`` entry
  nodes of its ``nseed`` nearest cells, then runs a batched
  best-first beam over the edge table inside a cogrouped
  applyInPandas task (queries are a DataFrame — no table data rides
  any closure). Final global top-k by window.
- **append**: new rows keep the quantizer, search their M nearest
  within their cell neighborhood (cost |new| x R x cell, never a
  rebuild), connect bidirectionally, local re-prune — the
  reference's incremental ``insert``.

Measured basis (scripts/proto_ann.py, 100k x 128-d, k=10): on a
clustered corpus (mixture of Gaussians — the structure real
embedding corpora have) this reaches recall 0.93 at ~750 q/s per
thread (C=256, ef=128); multi-seeding keeps 0.86 when cells are
under-provisioned. On the uniform-random adversary NO sublinear
method survives (measured: exact-graph beam 0.82@10 q/s, IVF routing
0.47, random-projection prefilter 0.05-0.10 — distance concentration
leaves nothing to exploit), so the engine's contract is: graph path
for structured data, exact GEMM path (operators/knn.py, full recall
at 1.7-2.6k q/s on the same hardware) for adversarial or
recall-critical workloads. SCALING.md quantifies this.

Scale posture: P spatial shards bound per-task state (vectors +
edges of one shard); cells group into shards by centroid clustering;
queries route to shards via their seed cells. Search cost per query
is ef-bounded (independent of shard size); build and append shuffle
only cell-neighborhood replicas (~R x corpus). Fully deterministic:
seeded k-means, deterministic blocked kNN, (distance, id) ties —
unlike the reference's CSPRNG build (``src/hnsw.zig:176``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.operators.knn import _pair_scores, _topk_by_dist_id

DEFAULT_CELL_TARGET = 400  # rows per quantizer cell
DEFAULT_SHARD_TARGET = 2_000_000  # rows per search shard (task state bound)
_MIN_CELLS = 4

_PAIR_SCHEMA = "pid int, query_id long, neighbor_id long, score double"
SEARCH_SCHEMA_STR = "query_id long, vec_id long, dist_sq double"


def knn_blocked_grouped(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
) -> DataFrame:
    """Exact kNN of probes vs corpus WITHIN each ``pid`` group, both
    sides DataFrames: one cogrouped applyInPandas GEMM per group, then
    a per-(pid, query) top-k window with deterministic (score, id)
    ties. Groups are cell neighborhoods (build/append) — already
    bounded — so no further sub-blocking is needed inside a group."""

    def _cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {"pid": [], "query_id": [], "neighbor_id": [], "score": []}
            ).astype(
                {
                    "pid": "int32",
                    "query_id": "int64",
                    "neighbor_id": "int64",
                    "score": "float64",
                }
            )
        qids = qpdf["query_id"].to_numpy()
        qarr = np.ascontiguousarray(
            np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)
        )
        ids = cpdf["vec_id"].to_numpy()
        mat = np.ascontiguousarray(
            np.stack(cpdf["emb"].to_numpy()).astype(np.float64)
        )
        d = _pair_scores(qarr, mat, "l2_sq")
        kk = min(k, mat.shape[0])
        part = _topk_by_dist_id(d, ids, kk)
        return pd.DataFrame(
            {
                "pid": np.full(len(qids) * kk, qpdf["pid"].iloc[0], dtype=np.int32),
                "query_id": np.repeat(qids, kk),
                "neighbor_id": ids[part.ravel()],
                "score": np.take_along_axis(d, part, axis=1).ravel(),
            }
        )

    per_cell = (
        probes.groupBy("pid")
        .cogroup(corpus.groupBy("pid"))
        .applyInPandas(_cell, _PAIR_SCHEMA)
    )
    w = W.partitionBy("pid", "query_id").orderBy("score", "neighbor_id")
    return (
        per_cell.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _cell_neighbors(centroids: np.ndarray, r: int) -> np.ndarray:
    """(C, r) nearest-cell lists by centroid distance (cell itself
    first) — driver-side metadata, C x C distances on k x dim floats."""
    cd = (centroids * centroids).sum(1)[None, :] - 2.0 * (centroids @ centroids.T)
    np.fill_diagonal(cd, -np.inf)  # own cell always ranks first
    return np.argsort(cd, axis=1, kind="stable")[:, : min(r, len(centroids))]


def build_cell_edges(
    celled: DataFrame,
    centroids: np.ndarray,
    m: int,
    r_build: int = 4,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Approximate M-NN edges, cell-blocked: probes (default: every
    node) search their ``m`` nearest among the members of their
    ``r_build`` nearest cells. The cell->group replication map is a
    tiny broadcast-joined literal table; the corpus replicates ~R x.
    Returns directed best-M lists (group key = probing cell)."""
    spark = celled.sparkSession
    nbr = _cell_neighbors(centroids, r_build)
    pairs = [(int(g), int(c)) for g in range(len(nbr)) for c in nbr[g]]
    cmap = spark.createDataFrame(pairs, "pid int, cell_id int")
    corpus = celled.join(F.broadcast(cmap), "cell_id").select(
        "pid", "vec_id", "emb"
    )
    if probes is None:
        probes = celled
    probes = probes.select(
        F.col("cell_id").alias("pid"),
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
    )
    return knn_blocked_grouped(corpus, probes, m + 1).filter(
        F.col("query_id") != F.col("neighbor_id")
    )


def _symmetrize_cap(nn: DataFrame, m: int) -> DataFrame:
    """Bidirectional edges + degree cap 2M by (distance, id) — the
    distributed connect + shrinkConnections (src/hnsw.zig:119-170).
    Returns (src, dst, score)."""
    fwd = nn.select(F.col("query_id").alias("src"),
                    F.col("neighbor_id").alias("dst"), "score")
    rev = nn.select(F.col("neighbor_id").alias("src"),
                    F.col("query_id").alias("dst"), "score")
    both = fwd.unionAll(rev).groupBy("src", "dst").agg(F.min("score").alias("score"))
    w = W.partitionBy("src").orderBy("score", "dst")
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2 * m)
        .drop("rn")
    )


def _beam_search_seeded(
    ids: np.ndarray,
    mat: np.ndarray,
    adj: np.ndarray,
    seeds_per_q: np.ndarray,
    qm: np.ndarray,
    qids: np.ndarray,
    k: int,
    ef: int,
) -> pd.DataFrame:
    """Batched best-first beam from per-query seed rows — the
    vectorized twin of the reference's heap loop
    (``src/hnsw.zig:211-224``): each step expands the beams of ALL
    queries in one numpy batch; the explored set is ef-bounded;
    results are the best k explored, ascending (distance, id)."""
    n = len(ids)
    nb = len(qm)
    budget = max(ef, k)
    if budget * 2 >= n:
        # budget touches (nearly) the whole shard: score exhaustively
        # instead — exact, preserving the k > N clamp
        # (src/test_hnsw.zig:121-125)
        d = _pair_scores(qm, mat, "l2_sq")
        kk = min(k, n)
        part = _topk_by_dist_id(d, ids, kk)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk),
                "vec_id": ids[part.ravel()],
                "dist_sq": np.take_along_axis(d, part, axis=1).ravel(),
            }
        )
    ns = seeds_per_q.shape[1]
    beam_width = max(8, budget // 8, ns)
    max_steps = max(3, -(-budget // beam_width))
    visited = np.zeros((nb, n + 1), dtype=bool)
    sq = seeds_per_q.copy()
    sq[sq < 0] = n  # sentinel for missing seeds (empty cells)
    visited[np.repeat(np.arange(nb), ns), sq.ravel()] = True
    visited[:, n] = True
    matx = np.vstack([mat, np.zeros((1, mat.shape[1]))])  # sentinel row
    diff = matx[sq.ravel()] - np.repeat(qm, ns, axis=0)
    d0 = np.einsum("ij,ij->i", diff, diff)
    d0[sq.ravel() == n] = np.inf
    acc_q = [np.repeat(np.arange(nb, dtype=np.int64), ns)]
    acc_p = [sq.ravel().astype(np.int64)]
    acc_d = [d0]
    beam = np.full((nb, beam_width), n, dtype=np.int64)
    beam[:, :ns] = sq
    active = np.ones(nb, dtype=bool)
    for _ in range(max_steps):
        if not active.any():
            break
        aq = np.nonzero(active)[0]
        cand = adj[beam[aq]].reshape(len(aq), -1)
        qidx = np.repeat(aq, cand.shape[1])
        cf = cand.ravel()
        msk = ~visited[qidx, cf]
        qidx, cf = qidx[msk], cf[msk]
        if not len(qidx):
            break
        key = qidx * (n + 1) + cf
        _, u = np.unique(key, return_index=True)
        qidx, cf = qidx[u], cf[u]
        visited[qidx, cf] = True
        diff = mat[cf] - qm[qidx]
        dd = np.einsum("ij,ij->i", diff, diff)
        acc_q.append(qidx)
        acc_p.append(cf)
        acc_d.append(dd)
        order = np.lexsort((cf, dd, qidx))
        qs_, ps_ = qidx[order], cf[order]
        starts = np.searchsorted(qs_, np.arange(nb + 1))
        rank = np.arange(len(qs_)) - starts[qs_]
        keep = rank < beam_width
        beam = np.full((nb, beam_width), n, dtype=np.int64)
        beam[qs_[keep], rank[keep]] = ps_[keep]
        active = np.zeros(nb, dtype=bool)
        active[qs_] = True
    pall, dall, qall = map(np.concatenate, (acc_p, acc_d, acc_q))
    ok = pall < n  # drop sentinel seeds
    pall, dall, qall = pall[ok], dall[ok], qall[ok]
    order = np.lexsort((pall, dall, qall))
    qs_, ps_, ds_ = qall[order], pall[order], dall[order]
    # dedupe (query, node): seeds may also be re-found via edges
    kq = qs_ * (n + 1) + ps_
    first = np.ones(len(kq), dtype=bool)
    first[1:] = kq[1:] != kq[:-1]
    qs_, ps_, ds_ = qs_[first], ps_[first], ds_[first]
    order = np.lexsort((ps_, ds_, qs_))
    qs_, ps_, ds_ = qs_[order], ps_[order], ds_[order]
    starts = np.searchsorted(qs_, np.arange(nb + 1))
    out_q, out_v, out_d = [], [], []
    for qi in range(nb):
        lo = starts[qi]
        hi = min(starts[qi + 1], lo + k)
        out_q.append(np.full(hi - lo, qids[qi], dtype=np.int64))
        out_v.append(ids[ps_[lo:hi]])
        out_d.append(ds_[lo:hi])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q) if out_q else [],
            "vec_id": np.concatenate(out_v) if out_v else [],
            "dist_sq": np.concatenate(out_d) if out_d else [],
        }
    )


class GraphIndex:
    """Cell-quantized, incrementally-appendable kNN-graph index with
    seeded beam search. Public shape mirrors the reference
    (build / append / search); see the module docstring for design
    and measured characteristics."""

    def __init__(
        self,
        m: int = 16,
        ef: int = 128,
        cell_target_rows: int = DEFAULT_CELL_TARGET,
        shard_target_rows: int = DEFAULT_SHARD_TARGET,
        r_build: int = 4,
        nseed: int = 8,
        seeds_per_cell: int = 2,
        seed: int = 42,
    ) -> None:
        self.m = m
        self.ef = ef
        self.cell_target_rows = cell_target_rows
        self.shard_target_rows = shard_target_rows
        self.r_build = r_build
        self.nseed = nseed
        self.seeds_per_cell = seeds_per_cell
        self.seed = seed
        # index metadata (driver-side, size O(C x dim) — the scalar
        # state analog of the reference's entry_point/max_level)
        self.centroids: np.ndarray | None = None
        self.cell_shard: np.ndarray | None = None  # (C,) cell -> pid
        self.cell_seeds: np.ndarray | None = None  # (C, spc) vec_ids, -1 pad
        # index data (DataFrames)
        self.celled: DataFrame | None = None  # (cell_id, vec_id, emb)
        self.edges: DataFrame | None = None  # (src, dst, score)
        self._state: DataFrame | None = None
        self._state_repl: dict[int, DataFrame] = {}

    # -- build (R1-R5, bulk) ----------------------------------------
    def build(self, emb: DataFrame, n_rows: int | None = None) -> "GraphIndex":
        """emb: (vec_id, emb)."""
        from zvdb_spark.operators.kmeans import assign_cells, kmeans_fit

        if n_rows is None:
            n_rows = emb.count()
        c_cells = max(_MIN_CELLS, math.ceil(n_rows / self.cell_target_rows))
        frac = min(1.0, (40.0 * c_cells) / max(n_rows, 1))
        sample = emb.sample(fraction=frac, seed=self.seed) if frac < 1.0 else emb
        self.centroids = kmeans_fit(
            sample, k=c_cells, n_iter=4, id_col="vec_id", vec_col="emb"
        )
        self.celled = (
            assign_cells(emb, self.centroids, "vec_id", "emb")
            .select("cell_id", "vec_id", "emb")
            .localCheckpoint(eager=True)
        )
        nn = build_cell_edges(self.celled, self.centroids, self.m, self.r_build)
        self.edges = _symmetrize_cap(nn, self.m).localCheckpoint(eager=True)
        self._assign_shards()
        self._collect_seeds()
        self._state = None
        self._state_repl = {}
        return self

    def _assign_shards(self) -> None:
        """Group cells into P search shards (task-state bound). P=1
        for anything under shard_target_rows; else k-means over the
        centroid matrix (driver-side, C x dim)."""
        c = len(self.centroids)
        n_shards = max(1, math.ceil(
            (self.celled.count()) / self.shard_target_rows
        ))
        if n_shards <= 1:
            self.cell_shard = np.zeros(c, dtype=np.int64)
            return
        cmat = self.centroids
        rng = np.random.default_rng(self.seed)
        centers = cmat[rng.choice(c, n_shards, replace=False)]
        for _ in range(8):
            d = (centers * centers).sum(1)[None, :] - 2.0 * (cmat @ centers.T)
            a = d.argmin(1)
            for j in range(n_shards):
                msk = a == j
                if msk.any():
                    centers[j] = cmat[msk].mean(0)
        self.cell_shard = a.astype(np.int64)

    def _collect_seeds(self) -> None:
        """Per-cell seed nodes: the member nearest the centroid plus
        evenly spaced members (covers multi-cluster cells). One
        aggregation collecting C x spc (cell, vec_id) rows — index
        metadata, not table data."""
        spc = self.seeds_per_cell
        cmat = self.centroids
        cn = (cmat * cmat).sum(1)

        @F.pandas_udf("double")
        def _dc(cell: pd.Series, vs: pd.Series) -> pd.Series:
            mat = np.stack(vs.to_numpy()).astype(np.float64)
            cidx = cell.to_numpy()
            diff = mat - cmat[cidx]
            return pd.Series(np.einsum("ij,ij->i", diff, diff))

        scored = self.celled.withColumn("dc", _dc(F.col("cell_id"), F.col("emb")))
        w_near = W.partitionBy("cell_id").orderBy("dc", "vec_id")
        w_spread = W.partitionBy("cell_id").orderBy("vec_id")
        cnt = F.count("*").over(W.partitionBy("cell_id"))
        picks = (
            scored.select(
                "cell_id",
                "vec_id",
                F.row_number().over(w_near).alias("rn_near"),
                F.row_number().over(w_spread).alias("rn_id"),
                cnt.alias("n"),
            )
            .filter(
                (F.col("rn_near") == 1)
                | (
                    (F.col("rn_id") % F.greatest(
                        (F.col("n") / spc).cast("int"), F.lit(1)
                    ) == 0)
                    & (F.col("rn_id") <= (spc - 1) * F.greatest(
                        (F.col("n") / spc).cast("int"), F.lit(1)
                    ))
                )
            )
            .select("cell_id", "vec_id", "rn_near")
            .collect()
        )
        c = len(cmat)
        seeds = np.full((c, spc), -1, dtype=np.int64)
        fill: dict[int, int] = {}
        # nearest-to-centroid first, then spread picks
        for row in sorted(picks, key=lambda r: (r.cell_id, r.rn_near != 1, r.vec_id)):
            j = fill.get(row.cell_id, 0)
            if j < spc and row.vec_id not in seeds[row.cell_id]:
                seeds[row.cell_id, j] = row.vec_id
                fill[row.cell_id] = j + 1
        self.cell_seeds = seeds

    # -- append (R2, incremental) -----------------------------------
    def append(self, emb_new: DataFrame) -> "GraphIndex":
        """Insert a batch into the EXISTING index without a rebuild:
        quantizer frozen, new rows search their M nearest within their
        cell neighborhood (cost |new| x R x cell rows), connect
        bidirectionally, degree re-cap — src/hnsw.zig:73-117 as a
        batch delta."""
        from zvdb_spark.operators.kmeans import assign_cells

        if self.celled is None:
            raise ValueError("build() first")
        new_celled = (
            assign_cells(emb_new, self.centroids, "vec_id", "emb")
            .select("cell_id", "vec_id", "emb")
            .localCheckpoint(eager=True)
        )
        all_celled = self.celled.unionAll(new_celled)
        nn = build_cell_edges(
            all_celled, self.centroids, self.m, self.r_build, probes=new_celled
        )
        delta = nn.select(
            F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst"), "score"
        )
        rev = nn.select(
            F.col("neighbor_id").alias("src"), F.col("query_id").alias("dst"), "score"
        )
        merged = (
            self.edges.unionAll(delta)
            .unionAll(rev)
            .groupBy("src", "dst")
            .agg(F.min("score").alias("score"))
        )
        w = W.partitionBy("src").orderBy("score", "dst")
        self.edges = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2 * self.m)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        self.celled = all_celled.localCheckpoint(eager=True)
        self._collect_seeds()  # refresh: appended rows can seed too
        self._state = None
        self._state_repl = {}
        return self

    # -- search (R7) -------------------------------------------------
    def state(self) -> DataFrame:
        """Packed per-shard search state, ONE ROW PER NODE:
        (pid, vec_id, emb, nbrs) with the adjacency as a sorted id
        array — the immutable-batch analog of the reference's node
        map + adjacency (src/hnsw.zig:44-50), packed so the per-search
        shuffle carries N rows, not N + |edges| rows."""
        if self._state is None:
            if self.celled is None:
                raise ValueError("build() first")
            spark = self.celled.sparkSession
            shard_map = spark.createDataFrame(
                [(int(c), int(p)) for c, p in enumerate(self.cell_shard)],
                "cell_id int, pid int",
            )
            adj = self.edges.groupBy("src").agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(score, dst))),"
                    " x -> x.dst)"
                ).alias("nbrs")
            )
            self._state = (
                self.celled.join(F.broadcast(shard_map), "cell_id")
                .join(adj, self.celled.vec_id == adj.src, "left")
                .select("pid", "vec_id", "emb", "nbrs")
                .localCheckpoint(eager=True)
            )
            self._state_repl = {}
        return self._state

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        ef: int | None = None,
        n_queries: int | None = None,
        n_qblocks: int | None = None,
    ) -> DataFrame:
        """queries: (query_id, qemb) DataFrame. Returns (query_id,
        vec_id, dist_sq), ≤ k rows per query ascending (dist_sq,
        vec_id). Routing, seeding and the beam all run inside the
        plan; the only driver-side inputs are the quantizer metadata
        arrays riding the UDF closures (k x dim floats)."""
        ef = ef or self.ef
        state = self.state()
        if n_qblocks is None:
            nq = n_queries if n_queries is not None else queries.count()
            n_qblocks = max(1, min(32, -(-nq // 512)))
        cmat = self.centroids
        cn = (cmat * cmat).sum(1)
        cell_shard = self.cell_shard
        cell_seeds = self.cell_seeds
        nseed = min(self.nseed, len(cmat))

        @F.pandas_udf("array<struct<pid:int,seeds:array<bigint>>>")
        def _route(vs: pd.Series) -> pd.Series:
            mat = np.stack(vs.to_numpy()).astype(np.float64)
            d = cn[None, :] - 2.0 * (mat @ cmat.T)
            near = np.argsort(d, axis=1, kind="stable")[:, :nseed]
            out = []
            for row in near:
                by_pid: dict[int, list[int]] = {}
                for c in row:
                    sds = [int(s) for s in cell_seeds[c] if s >= 0]
                    if sds:
                        by_pid.setdefault(int(cell_shard[c]), []).extend(sds)
                out.append(
                    [{"pid": p, "seeds": s} for p, s in sorted(by_pid.items())]
                )
            return pd.Series(out)

        routed = (
            queries.withColumn("r", F.explode(_route(F.col("qemb"))))
            .select(
                "query_id",
                "qemb",
                F.col("r.pid").alias("pid"),
                F.col("r.seeds").alias("seeds"),
            )
            .withColumn(
                "qb",
                (F.crc32(F.col("query_id").cast("string")) % n_qblocks).cast("int"),
            )
        )
        state_r = self._state_repl.get(n_qblocks)
        if state_r is None:
            state_r = state.withColumn(
                "qb", F.explode(F.array(*[F.lit(b) for b in range(n_qblocks)]))
            ).localCheckpoint(eager=True)
            # cached per fan-out: repeated searches skip the replicate
            # shuffle (on a cluster this is a persisted, pre-keyed RDD)
            self._state_repl[n_qblocks] = state_r

        def _cell_fn(qpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"query_id": [], "vec_id": [], "dist_sq": []}
            ).astype({"query_id": "int64", "vec_id": "int64", "dist_sq": "float64"})
            if not len(qpdf) or not len(spdf):
                return empty
            ids = spdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            mat = np.ascontiguousarray(
                np.stack(spdf["emb"].to_numpy()[order]).astype(np.float64)
            )
            n = len(ids)
            nbrs = spdf["nbrs"].to_numpy()[order]
            deg = np.fromiter(
                (0 if a is None else len(a) for a in nbrs), dtype=np.int64, count=n
            )
            maxdeg = int(deg.max()) if n and deg.max() > 0 else 1
            adj = np.full((n + 1, maxdeg), n, dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in nbrs if a is not None]
            ) if deg.sum() else np.empty(0, dtype=np.int64)
            pos = np.searchsorted(ids, flat)
            # edges whose dst lives in another shard are dropped (the
            # graph is cut at shard boundaries; routing compensates)
            pos = np.minimum(pos, n - 1)
            valid = ids[pos] == flat
            row_idx = np.repeat(np.arange(n), deg)
            col_idx = np.concatenate(
                [np.arange(d) for d in deg if d > 0]
            ) if deg.sum() else np.empty(0, dtype=np.int64)
            adj[row_idx[valid], col_idx[valid]] = pos[valid]
            qids = qpdf["query_id"].to_numpy()
            qm = np.ascontiguousarray(
                np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)
            )
            max_ns = max(len(s) for s in qpdf["seeds"])
            seeds = np.full((len(qids), max_ns), -1, dtype=np.int64)
            for i, s in enumerate(qpdf["seeds"]):
                sp = np.searchsorted(ids, np.asarray(s, dtype=np.int64))
                sp = np.minimum(sp, n - 1)
                ok = ids[sp] == np.asarray(s, dtype=np.int64)
                sp = sp[ok]
                seeds[i, : len(sp)] = sp
            return _beam_search_seeded(ids, mat, adj, seeds, qm, qids, k, ef)

        per_cell = (
            routed.groupBy("pid", "qb")
            .cogroup(state_r.groupBy("pid", "qb"))
            .applyInPandas(_cell_fn, SEARCH_SCHEMA_STR)
        )
        w = W.partitionBy("query_id").orderBy("dist_sq", "vec_id")
        return (
            per_cell.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    # -- misc ---------------------------------------------------------
    @property
    def sharded(self) -> DataFrame | None:
        return self.celled
