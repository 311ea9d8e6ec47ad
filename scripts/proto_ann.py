"""Prototype: spatially-sharded kNN-graph ANN — parameter search.

Measures, on 100k x 128-d uniform (the reference bench distribution):
- routing recall upper bound: P(true top-10 in nprobe nearest shards)
- end recall: routed beam search on per-shard exact M-NN graphs
- per-query arithmetic cost (expansions) to estimate Spark q/s
"""

import sys
import time

import numpy as np

N, DIM, NQ, K = 100_000, 128, 1000, 10
rng = np.random.default_rng(42)
X = rng.random((N, DIM))
Q = rng.random((NQ, DIM))

# ground truth (chunked GEMM)
t0 = time.time()
xn = (X * X).sum(1)
gt = np.empty((NQ, K), dtype=np.int64)
for i in range(0, NQ, 256):
    q = Q[i : i + 256]
    d = xn[None, :] - 2.0 * (q @ X.T)
    gt[i : i + 256] = np.argsort(d, axis=1, kind="stable")[:, :K]
print(f"ground truth {time.time()-t0:.1f}s", flush=True)


def kmeans(X, k, iters=6, sample=20000):
    S = X[rng.choice(len(X), sample, replace=False)]
    C = S[:k].copy()
    for _ in range(iters):
        d = (C * C).sum(1)[None, :] - 2.0 * (S @ C.T)
        a = d.argmin(1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = S[m].mean(0)
    return C


def assign(X, C, chunk=8192):
    out = np.empty(len(X), dtype=np.int64)
    cn = (C * C).sum(1)
    for i in range(0, len(X), chunk):
        d = cn[None, :] - 2.0 * (X[i : i + chunk] @ C.T)
        out[i : i + chunk] = d.argmin(1)
    return out


def build_mnn_graph(mat, M, chunk=2048):
    """Exact M-NN graph: top-M neighbors per node (excl self), then
    symmetrize with degree cap 2M."""
    n = len(mat)
    nn = np.empty((n, M), dtype=np.int64)
    mn = (mat * mat).sum(1)
    for i in range(0, n, chunk):
        d = mn[None, :] - 2.0 * (mat[i : i + chunk] @ mat.T)
        d[np.arange(len(d)), np.arange(i, min(i + chunk, n))] = np.inf
        nn[i : i + chunk] = np.argpartition(d, M, axis=1)[:, :M]
    # symmetrize: edges both ways, cap degree
    src = np.repeat(np.arange(n), M)
    dst = nn.ravel()
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    # dedupe
    key = s2 * n + d2
    _, idx = np.unique(key, return_index=True)
    s2, d2 = s2[idx], d2[idx]
    # cap degree at 2M by distance
    dist = ((mat[s2] - mat[d2]) ** 2).sum(1)
    order = np.lexsort((dist, s2))
    s2, d2 = s2[order], d2[order]
    starts = np.searchsorted(s2, np.arange(n + 1))
    rank = np.arange(len(s2)) - starts[s2]
    keep = rank < 2 * M
    return s2[keep], d2[keep]


def beam_search(mat, adj_mat, entry, qm, k, ef, beam_width=None, max_steps=None):
    """Batched beam search (same shape as operators/hnsw.py)."""
    n = len(mat)
    nb = len(qm)
    budget = max(ef, k)
    beam_width = beam_width or max(8, budget // 8)
    max_steps = max_steps or max(3, budget // beam_width)
    visited = np.zeros((nb, n + 1), dtype=bool)
    visited[:, entry] = True
    visited[:, n] = True
    d0 = qm - mat[entry]
    acc_p = [np.full(nb, entry, dtype=np.int64)]
    acc_d = [np.einsum("ij,ij->i", d0, d0)]
    acc_q = [np.arange(nb, dtype=np.int64)]
    beam = np.full((nb, beam_width), n, dtype=np.int64)
    beam[:, 0] = entry
    active = np.ones(nb, dtype=bool)
    nexp = 0
    for _ in range(max_steps):
        if not active.any():
            break
        aq = np.nonzero(active)[0]
        cand = adj_mat[beam[aq]].reshape(len(aq), -1)
        qidx = np.repeat(aq, cand.shape[1])
        cf = cand.ravel()
        m = ~visited[qidx, cf]
        qidx, cf = qidx[m], cf[m]
        if not len(qidx):
            break
        key = qidx * (n + 1) + cf
        _, u = np.unique(key, return_index=True)
        qidx, cf = qidx[u], cf[u]
        visited[qidx, cf] = True
        diff = mat[cf] - qm[qidx]
        dd = np.einsum("ij,ij->i", diff, diff)
        nexp += len(cf)
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
    order = np.lexsort((pall, dall, qall))
    qs_, ps_, ds_ = qall[order], pall[order], dall[order]
    starts = np.searchsorted(qs_, np.arange(nb + 1))
    res = []
    for qi in range(nb):
        lo = starts[qi]
        hi = min(starts[qi + 1], lo + k)
        res.append(ps_[lo:hi])
    return res, nexp


def run(P, nprobe, M, ef):
    C = kmeans(X, P)
    cell = assign(X, C)
    # routing upper bound
    qd = (C * C).sum(1)[None, :] - 2.0 * (Q @ C.T)
    probe = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    gtcell = cell[gt]  # (NQ, K)
    ub = np.mean(
        [(np.isin(gtcell[i], probe[i])).mean() for i in range(NQ)]
    )
    # build shard graphs
    t0 = time.time()
    shards = {}
    for p in range(P):
        idx = np.nonzero(cell == p)[0]
        mat = X[idx]
        s, d = build_mnn_graph(mat, M)
        maxdeg = 2 * M
        n = len(idx)
        adj = np.full((n + 1, maxdeg), n, dtype=np.int64)
        starts = np.searchsorted(s, np.arange(n + 1))
        for j in range(n):
            a = d[starts[j] : starts[j + 1]]
            adj[j, : len(a)] = a
        # entry: node nearest to centroid
        dc = ((mat - C[p]) ** 2).sum(1)
        shards[p] = (idx, mat, adj, int(dc.argmin()))
    build_s = time.time() - t0
    # routed search
    t0 = time.time()
    hits = 0
    nexp_tot = 0
    results = [[] for _ in range(NQ)]
    for p in range(P):
        qmask = (probe == p).any(1)
        qi = np.nonzero(qmask)[0]
        if not len(qi):
            continue
        idx, mat, adj, entry = shards[p]
        res, nexp = beam_search(mat, adj, entry, Q[qi], K, ef)
        nexp_tot += nexp
        for j, q in enumerate(qi):
            results[q].append(idx[res[j]])
    # merge per query by true distance
    for q in range(NQ):
        cand = np.concatenate(results[q])
        d = ((X[cand] - Q[q]) ** 2).sum(1)
        top = cand[np.lexsort((cand, d))[:K]]
        hits += len(set(top) & set(gt[q]))
    search_s = time.time() - t0
    rec = hits / (NQ * K)
    print(
        f"P={P:3d} nprobe={nprobe} M={M} ef={ef}: route_ub={ub:.3f} "
        f"recall={rec:.3f} build={build_s:.1f}s search={search_s:.1f}s "
        f"({NQ/search_s:.0f} q/s 1-thread) exp/q={nexp_tot/NQ:.0f}",
        flush=True,
    )


if sys.argv[1:] and sys.argv[1] == "grid":
    for args in [
        (16, 4, 16, 96),
        (16, 6, 16, 96),
        (8, 3, 16, 96),
        (8, 4, 16, 128),
        (8, 4, 16, 64),
        (32, 8, 16, 96),
    ]:
        run(*args)


def run_global(M, ef, beam_width=None, nq_batch=1000):
    """Single global M-NN graph (P=1): recall + batched search cost."""
    t0 = time.time()
    s, d = build_mnn_graph(X, M, chunk=1024)
    n = len(X)
    maxdeg = 2 * M
    adj = np.full((n + 1, maxdeg), n, dtype=np.int64)
    starts = np.searchsorted(s, np.arange(n + 1))
    for j in range(n):
        a = d[starts[j] : starts[j + 1]]
        adj[j, : len(a)] = a
    centroid = X.mean(0)
    entry = int(((X - centroid) ** 2).sum(1).argmin())
    build_s = time.time() - t0
    t0 = time.time()
    res, nexp = beam_search(X, adj, entry, Q[:nq_batch], K, ef, beam_width=beam_width)
    search_s = time.time() - t0
    hits = sum(len(set(res[q][:K]) & set(gt[q])) for q in range(nq_batch))
    rec = hits / (nq_batch * K)
    print(
        f"GLOBAL M={M} ef={ef} bw={beam_width}: recall={rec:.3f} build={build_s:.1f}s "
        f"search={search_s:.2f}s ({nq_batch/search_s:.0f} q/s 1-thread) exp/q={nexp/nq_batch:.0f}",
        flush=True,
    )


if sys.argv[1:] and sys.argv[1] == "global":
    for M, ef, bw in [(16, 96, None), (16, 128, None), (16, 192, None),
                      (24, 128, None), (16, 128, 8), (16, 192, 16), (24, 192, 16)]:
        run_global(M, ef, bw)


def _load_or_build_graph(M=16):
    import os
    path = f"/tmp/proto_graph_M{M}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return z["s"], z["d"]
    s, d = build_mnn_graph(X, M, chunk=2048)
    np.savez(path, s=s, d=d)
    return s, d


def beam_search_seeded(mat, adj_mat, seeds_per_q, qm, k, ef, beam_width=16):
    """Beam init from per-query seed lists instead of one entry."""
    n = len(mat)
    nb = len(qm)
    budget = max(ef, k)
    max_steps = max(3, -(-budget // beam_width))
    ns = seeds_per_q.shape[1]
    visited = np.zeros((nb, n + 1), dtype=bool)
    visited[np.repeat(np.arange(nb), ns), seeds_per_q.ravel()] = True
    visited[:, n] = True
    diff = mat[seeds_per_q.ravel()] - np.repeat(qm, ns, axis=0)
    d0 = np.einsum("ij,ij->i", diff, diff)
    acc_q = [np.repeat(np.arange(nb, dtype=np.int64), ns)]
    acc_p = [seeds_per_q.ravel().astype(np.int64)]
    acc_d = [d0]
    bw = max(beam_width, ns)
    beam = np.full((nb, bw), n, dtype=np.int64)
    beam[:, :ns] = seeds_per_q
    active = np.ones(nb, dtype=bool)
    nexp = 0
    for _ in range(max_steps):
        if not active.any():
            break
        aq = np.nonzero(active)[0]
        cand = adj_mat[beam[aq]].reshape(len(aq), -1)
        qidx = np.repeat(aq, cand.shape[1])
        cf = cand.ravel()
        m = ~visited[qidx, cf]
        qidx, cf = qidx[m], cf[m]
        if not len(qidx):
            break
        key = qidx * (n + 1) + cf
        _, u = np.unique(key, return_index=True)
        qidx, cf = qidx[u], cf[u]
        visited[qidx, cf] = True
        diff = mat[cf] - qm[qidx]
        dd = np.einsum("ij,ij->i", diff, diff)
        nexp += len(cf)
        acc_q.append(qidx); acc_p.append(cf); acc_d.append(dd)
        order = np.lexsort((cf, dd, qidx))
        qs_, ps_ = qidx[order], cf[order]
        starts = np.searchsorted(qs_, np.arange(nb + 1))
        rank = np.arange(len(qs_)) - starts[qs_]
        keep = rank < beam_width
        beam = np.full((nb, bw), n, dtype=np.int64)
        beam[qs_[keep], rank[keep]] = ps_[keep]
        active = np.zeros(nb, dtype=bool)
        active[qs_] = True
    pall, dall, qall = map(np.concatenate, (acc_p, acc_d, acc_q))
    order = np.lexsort((pall, dall, qall))
    qs_, ps_ = qall[order], pall[order]
    starts = np.searchsorted(qs_, np.arange(nb + 1))
    res = []
    for qi in range(nb):
        lo = starts[qi]
        hi = min(starts[qi + 1], lo + k)
        res.append(ps_[lo:hi])
    return res, nexp


def run_seeded(M, ef, C, nseed, bw, nq_batch=1000):
    s, d = _load_or_build_graph(M)
    n = len(X)
    maxdeg = 2 * M
    adj = np.full((n + 1, maxdeg), n, dtype=np.int64)
    starts = np.searchsorted(s, np.arange(n + 1))
    for j in range(n):
        a = d[starts[j] : starts[j + 1]]
        adj[j, : len(a)] = a
    t0 = time.time()
    Cc = kmeans(X, C, iters=5)
    cell = assign(X, Cc)
    # per-cell entry node: nearest to centroid
    entries = np.zeros(C, dtype=np.int64)
    for c in range(C):
        idx = np.nonzero(cell == c)[0]
        if len(idx):
            dc = ((X[idx] - Cc[c]) ** 2).sum(1)
            entries[c] = idx[dc.argmin()]
    seed_prep_s = time.time() - t0
    t0 = time.time()
    qd = (Cc * Cc).sum(1)[None, :] - 2.0 * (Q[:nq_batch] @ Cc.T)
    near = np.argsort(qd, axis=1, kind="stable")[:, :nseed]
    seeds = entries[near]
    res, nexp = beam_search_seeded(X, adj, seeds, Q[:nq_batch], K, ef, bw)
    search_s = time.time() - t0
    hits = sum(len(set(res[q][:K]) & set(gt[q])) for q in range(nq_batch))
    rec = hits / (nq_batch * K)
    print(
        f"SEEDED M={M} ef={ef} C={C} nseed={nseed} bw={bw}: recall={rec:.3f} "
        f"prep={seed_prep_s:.1f}s search={search_s:.2f}s "
        f"({nq_batch/search_s:.0f} q/s 1-thread) exp/q={nexp/nq_batch:.0f}",
        flush=True,
    )


if sys.argv[1:] and sys.argv[1] == "seeded":
    for M, ef, C, nseed, bw in [
        (16, 128, 128, 8, 16),
        (16, 192, 128, 8, 24),
        (16, 256, 128, 16, 32),
        (16, 384, 256, 16, 48),
        (16, 512, 256, 32, 64),
    ]:
        run_seeded(M, ef, C, nseed, bw)


def build_mnn_graph_cells(X, M, C, R, Cc=None, cell=None):
    """Approximate M-NN graph: each node's neighbors searched only in
    its cell + the R-1 nearest cells (cell-blocked build — fraction
    ~R/C of the exact N^2 work)."""
    n = len(X)
    if Cc is None:
        Cc = kmeans(X, C)
        cell = assign(X, Cc)
    # cell neighbor lists (C x R) by centroid distance
    cd = (Cc * Cc).sum(1)[None, :] - 2.0 * (Cc @ Cc.T)
    nbr = np.argsort(cd, axis=1, kind="stable")[:, :R]
    # per-cell member lists
    members = [np.nonzero(cell == c)[0] for c in range(C)]
    nn_src, nn_dst, nn_d = [], [], []
    for g in range(C):
        probes = members[g]
        if not len(probes):
            continue
        cand = np.concatenate([members[c] for c in nbr[g]])
        pm, cm = X[probes], X[cand]
        d = (cm * cm).sum(1)[None, :] - 2.0 * (pm @ cm.T)
        # mask self
        selfmask = cand[None, :] == probes[:, None]
        d[selfmask] = np.inf
        kk = min(M, len(cand) - 1)
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        nn_src.append(np.repeat(probes, kk))
        nn_dst.append(cand[part.ravel()])
        nn_d.append(np.take_along_axis(d, part, axis=1).ravel())
    src = np.concatenate(nn_src); dst = np.concatenate(nn_dst)
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    key = s2 * n + d2
    _, idx = np.unique(key, return_index=True)
    s2, d2 = s2[idx], d2[idx]
    dist = ((X[s2] - X[d2]) ** 2).sum(1)
    order = np.lexsort((dist, s2))
    s2, d2 = s2[order], d2[order]
    starts = np.searchsorted(s2, np.arange(n + 1))
    rank = np.arange(len(s2)) - starts[s2]
    keep = rank < 2 * M
    return s2[keep], d2[keep], Cc, cell


def run_approx(M, ef, C, R, nseed, bw, nq_batch=1000):
    t0 = time.time()
    s, d, Cc, cell = build_mnn_graph_cells(X, M, C, R)
    build_s = time.time() - t0
    n = len(X)
    maxdeg = 2 * M
    adj = np.full((n + 1, maxdeg), n, dtype=np.int64)
    starts = np.searchsorted(s, np.arange(n + 1))
    for j in range(n):
        a = d[starts[j] : starts[j + 1]]
        adj[j, : len(a)] = a
    entries = np.zeros(C, dtype=np.int64)
    for c in range(C):
        idx = np.nonzero(cell == c)[0]
        if len(idx):
            dc = ((X[idx] - Cc[c]) ** 2).sum(1)
            entries[c] = idx[dc.argmin()]
    t0 = time.time()
    qd = (Cc * Cc).sum(1)[None, :] - 2.0 * (Q[:nq_batch] @ Cc.T)
    near = np.argsort(qd, axis=1, kind="stable")[:, :nseed]
    seeds = entries[near]
    res, nexp = beam_search_seeded(X, adj, seeds, Q[:nq_batch], K, ef, bw)
    search_s = time.time() - t0
    hits = sum(len(set(res[q][:K]) & set(gt[q])) for q in range(nq_batch))
    rec = hits / (nq_batch * K)
    print(
        f"APPROX M={M} ef={ef} C={C} R={R} nseed={nseed} bw={bw}: "
        f"recall={rec:.3f} build={build_s:.1f}s search={search_s:.2f}s "
        f"({nq_batch/search_s:.0f} q/s 1-thread) exp/q={nexp/nq_batch:.0f}",
        flush=True,
    )


if sys.argv[1:] and sys.argv[1] == "approx":
    for args in [
        (16, 192, 64, 4, 8, 24),
        (16, 192, 64, 8, 8, 24),
        (16, 256, 128, 8, 16, 32),
        (16, 384, 128, 8, 16, 48),
        (24, 256, 64, 8, 16, 32),
    ]:
        run_approx(*args)


def run_rp(dp, cand, nq_batch=1000):
    """Random-projection prefilter: top-`cand` in dp-dim projected
    space (one GEMM), exact re-rank of candidates in full dim."""
    rng2 = np.random.default_rng(7)
    R = rng2.standard_normal((DIM, dp)) / np.sqrt(dp)
    t0 = time.time()
    XP = X @ R
    build_s = time.time() - t0
    xn = (XP * XP).sum(1)
    t0 = time.time()
    QP = Q[:nq_batch] @ R
    hits = 0
    chunk = 256
    for lo in range(0, nq_batch, chunk):
        qp = QP[lo : lo + chunk]
        d = xn[None, :] - 2.0 * (qp @ XP.T)
        part = np.argpartition(d, cand - 1, axis=1)[:, :cand]
        for j in range(len(qp)):
            q = lo + j
            c = part[j]
            dd = ((X[c] - Q[q]) ** 2).sum(1)
            top = c[np.lexsort((c, dd))[:K]]
            hits += len(set(top) & set(gt[q]))
    search_s = time.time() - t0
    rec = hits / (nq_batch * K)
    print(
        f"RP dp={dp} cand={cand}: recall={rec:.3f} project={build_s:.2f}s "
        f"search={search_s:.2f}s ({nq_batch/search_s:.0f} q/s 1-thread)",
        flush=True,
    )


if sys.argv[1:] and sys.argv[1] == "rp":
    for dp, cand in [(16, 100), (24, 100), (32, 100), (32, 50), (32, 200),
                     (48, 100), (24, 200), (16, 200)]:
        run_rp(dp, cand)


if sys.argv[1:] and sys.argv[1] == "clustered":
    # regenerate corpus as a seeded Gaussian mixture: the distribution
    # where ANN structure exists (real embedding corpora cluster)
    NCLUST = 200
    sigma = float(sys.argv[2]) if sys.argv[2:] else 0.08
    rng3 = np.random.default_rng(123)
    centers = rng3.random((NCLUST, DIM))
    ca = rng3.integers(0, NCLUST, N)
    X = centers[ca] + sigma * rng3.standard_normal((N, DIM))
    qa = rng3.integers(0, NCLUST, NQ)
    Q = centers[qa] + sigma * rng3.standard_normal((NQ, DIM))
    t0 = time.time()
    xn = (X * X).sum(1)
    gt = np.empty((NQ, K), dtype=np.int64)
    for i in range(0, NQ, 256):
        q = Q[i : i + 256]
        d = xn[None, :] - 2.0 * (q @ X.T)
        gt[i : i + 256] = np.argsort(d, axis=1, kind="stable")[:, :K]
    print(f"clustered gt {time.time()-t0:.1f}s sigma={sigma}", flush=True)
    for args in [
        (16, 96, 128, 4, 4, 12),
        (16, 128, 128, 4, 8, 16),
        (16, 128, 256, 4, 8, 16),
        (16, 192, 256, 8, 8, 24),
    ]:
        run_approx(*args)


def run_approx_ms(M, ef, C, R, nseed, bw, spc, nq_batch=1000):
    """Multi-seed per cell: spc seeds per routed cell (nearest-to-
    centroid + evenly spaced members) — covers multi-cluster cells."""
    t0 = time.time()
    s, d, Cc, cell = build_mnn_graph_cells(X, M, C, R)
    build_s = time.time() - t0
    n = len(X)
    maxdeg = 2 * M
    adj = np.full((n + 1, maxdeg), n, dtype=np.int64)
    starts = np.searchsorted(s, np.arange(n + 1))
    for j in range(n):
        a = d[starts[j] : starts[j + 1]]
        adj[j, : len(a)] = a
    ent = np.zeros((C, spc), dtype=np.int64)
    for c in range(C):
        idx = np.nonzero(cell == c)[0]
        if len(idx):
            dc = ((X[idx] - Cc[c]) ** 2).sum(1)
            picks = [idx[dc.argmin()]]
            step = max(1, len(idx) // spc)
            picks += [idx[(j * step) % len(idx)] for j in range(1, spc)]
            ent[c] = np.array(picks[:spc])
    t0 = time.time()
    qd = (Cc * Cc).sum(1)[None, :] - 2.0 * (Q[:nq_batch] @ Cc.T)
    near = np.argsort(qd, axis=1, kind="stable")[:, :nseed]
    seeds = ent[near].reshape(nq_batch, -1)
    res, nexp = beam_search_seeded(X, adj, seeds, Q[:nq_batch], K, ef, bw)
    search_s = time.time() - t0
    hits = sum(len(set(res[q][:K]) & set(gt[q])) for q in range(nq_batch))
    rec = hits / (nq_batch * K)
    print(
        f"MS M={M} ef={ef} C={C} R={R} nseed={nseed} bw={bw} spc={spc}: "
        f"recall={rec:.3f} build={build_s:.1f}s search={search_s:.2f}s "
        f"({nq_batch/search_s:.0f} q/s 1-thread) exp/q={nexp/nq_batch:.0f}",
        flush=True,
    )


if sys.argv[1:] and sys.argv[1] == "clustered_ms":
    NCLUST = 200
    sigma = float(sys.argv[2]) if sys.argv[2:] else 0.08
    rng3 = np.random.default_rng(123)
    centers = rng3.random((NCLUST, DIM))
    ca = rng3.integers(0, NCLUST, N)
    X = centers[ca] + sigma * rng3.standard_normal((N, DIM))
    qa = rng3.integers(0, NCLUST, NQ)
    Q = centers[qa] + sigma * rng3.standard_normal((NQ, DIM))
    xn = (X * X).sum(1)
    gt = np.empty((NQ, K), dtype=np.int64)
    for i in range(0, NQ, 256):
        q = Q[i : i + 256]
        d = xn[None, :] - 2.0 * (q @ X.T)
        gt[i : i + 256] = np.argsort(d, axis=1, kind="stable")[:, :K]
    print(f"clustered sigma={sigma}", flush=True)
    for args in [
        (16, 96, 128, 4, 4, 12, 4),
        (16, 128, 128, 4, 8, 16, 4),
        (16, 128, 256, 4, 8, 16, 2),
        (16, 128, 256, 4, 8, 16, 4),
    ]:
        run_approx_ms(*args)
