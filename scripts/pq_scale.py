"""PQ scale experiment: encode throughput, capped-rerank search qps
and recall at bench scale and 10x (default 1M x 128-d), against the
exact-GEMM baseline on the same corpus.

The claim under test (SCALING.md, ANN §4): ADC + capped candidate
emission keeps the merge O(nq x 2R) so PQ search cost stays flat-ish
in corpus size while exact GEMM grows linearly — and the capped
emission does not collapse recall vs the uncapped definition.

Usage: python scripts/pq_scale.py [n_rows] (default 1,000,000)
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM, NQ, K, SEED, R = 128, 10_000, 10, 42, 400
N_PROBE_RECALL = 200


def main() -> None:
    import pandas as pd

    from zvdb_spark.operators.knn import exact_search_blocked
    from zvdb_spark.operators.pq import pq_encode, pq_search_rerank, pq_train
    from zvdb_spark.session import get_session

    spark = get_session("pq_scale")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [np.random.default_rng(SEED + int(i)).random(DIM) for i in ids]
            yield pd.DataFrame({"vec_id": ids, "emb": rows})

    emb = (
        spark.range(N)
        .repartition(cpus)
        .mapInPandas(_gen, "vec_id long, emb array<double>")
        .localCheckpoint(eager=True)
    )
    out: dict = {"n": N, "dim": DIM, "nq": NQ, "k": K, "rerank_r": R}

    t0 = time.perf_counter()
    books = pq_train(emb, m_sub=16, k_codes=256, n_iter=4, sample_n=20_000, n_rows=N)
    out["train_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    codes = pq_encode(emb, books).localCheckpoint(eager=True)
    enc = time.perf_counter() - t0
    out["encode_sec"] = round(enc, 2)
    out["encode_pts_per_s"] = round(N / enc, 1)

    rng = np.random.default_rng(SEED)
    queries = rng.random((NQ, DIM))

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm + timed PQ capped-rerank search
    _noop(pq_search_rerank(codes, emb, books, queries, k=K, rerank_r=R))
    t0 = time.perf_counter()
    _noop(pq_search_rerank(codes, emb, books, queries, k=K, rerank_r=R))
    pq_sec = time.perf_counter() - t0
    out["pq_search_sec"] = round(pq_sec, 2)
    out["pq_qps"] = round(NQ / pq_sec, 1)

    # exact baseline on the same corpus/queries
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in r]) for i, r in enumerate(queries)],
        "query_id long, qemb array<double>",
    ).localCheckpoint(eager=True)
    probes = qdf
    _noop(exact_search_blocked(emb, probes, k=K, n_corpus=N, n_probes=NQ))
    t0 = time.perf_counter()
    _noop(exact_search_blocked(emb, probes, k=K, n_corpus=N, n_probes=NQ))
    ex_sec = time.perf_counter() - t0
    out["exact_search_sec"] = round(ex_sec, 2)
    out["exact_qps"] = round(NQ / ex_sec, 1)

    # recall of the capped-rerank path vs exact, on a probe subset
    sub = queries[:N_PROBE_RECALL]
    got = pq_search_rerank(codes, emb, books, sub, k=K, rerank_r=R).toPandas()
    subdf = spark.createDataFrame(
        [(int(i), [float(x) for x in r]) for i, r in enumerate(sub)],
        "query_id long, qemb array<double>",
    )
    ex = exact_search_blocked(
        emb, subdf, k=K, n_corpus=N, n_probes=N_PROBE_RECALL
    ).toPandas()
    hits = sum(
        len(
            set(got[got.query_id == q].vec_id)
            & set(ex[ex.query_id == q].neighbor_id)
        )
        for q in range(N_PROBE_RECALL)
    )
    out["pq_recall_at_k"] = round(hits / (N_PROBE_RECALL * K), 3)

    # ---- IVF+PQ on a CLUSTERED corpus (the fair selectivity test:
    # flat ADC above scores every row — gather-bound and slower than
    # BLAS GEMM at equal residency; cell-probed ADC scores nprobe/C
    # of the rows, which is the production IVFPQ deployment. Uniform
    # data has no cells to find, so this section uses the same
    # clustered distribution the graph bench uses.)
    from zvdb_spark.operators.kmeans import kmeans_fit_sample
    from zvdb_spark.operators.pq import exact_rerank, ivfpq_build, pq_search_ivf

    n_clust = max(20, N // 500)

    def _gen_clustered(batches):
        centers = np.random.default_rng(SEED + 1).random((n_clust, DIM))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                r = np.random.default_rng(SEED + 1 + int(i))
                c = int(r.integers(0, n_clust))
                rows.append(centers[c] + 0.08 * r.standard_normal(DIM))
            yield pd.DataFrame({"vec_id": ids, "emb": rows})

    cemb = (
        spark.range(N)
        .repartition(cpus)
        .mapInPandas(_gen_clustered, "vec_id long, emb array<double>")
        .localCheckpoint(eager=True)
    )
    # quantizer capacity must track the corpus's cluster count
    # (C < n_clust leaves merged cells whose residuals are as large
    # as inter-cluster distances — measured recall 0.50 at 1M with
    # C=1024 under 2000 natural clusters)
    C = 1024 if N <= 200_000 else 4096
    NPROBE = 64 if C == 1024 else 128
    out["ivfpq_cells"], out["ivfpq_nprobe"] = C, NPROBE
    t0 = time.perf_counter()
    cents = kmeans_fit_sample(
        cemb, k=C, n_iter=6, sample_n=min(100_000, max(50_000, N // 10)),
        n_rows=N,
    )
    # residual encoding (ivfpq_build): codes model x - centroid(cell),
    # so within-cell ADC ranking stays informative — raw-vector codes
    # measured 0.30-0.42 recall here vs residual codes' 0.9+
    cbooks, ccodes = ivfpq_build(
        cemb, cents, m_sub=16, k_codes=256, n_iter=4, sample_n=20_000,
        n_rows=N,
    )
    ccodes = ccodes.localCheckpoint(eager=True)
    out["ivfpq_build_sec"] = round(time.perf_counter() - t0, 2)

    centers = np.random.default_rng(SEED + 1).random((n_clust, DIM))
    crng = np.random.default_rng(SEED + 7)
    cq = centers[crng.integers(0, n_clust, NQ)] + 0.08 * crng.standard_normal(
        (NQ, DIM)
    )

    def _ivfpq(qarr, k):
        cand = pq_search_ivf(
            ccodes, cbooks, cents, qarr, k=R, nprobe=NPROBE,
            per_task_cap=64, residual=True,
        )
        return exact_rerank(cand, cemb, qarr, k=k, cand_rows=len(qarr) * R)

    _noop(_ivfpq(cq, K))
    t0 = time.perf_counter()
    _noop(_ivfpq(cq, K))
    iv_sec = time.perf_counter() - t0
    out["ivfpq_search_sec"] = round(iv_sec, 2)
    out["ivfpq_qps"] = round(NQ / iv_sec, 1)

    csub = cq[:N_PROBE_RECALL]
    got = _ivfpq(csub, K).toPandas()
    csubdf = spark.createDataFrame(
        [(int(i), [float(x) for x in r]) for i, r in enumerate(csub)],
        "query_id long, qemb array<double>",
    )
    cex = exact_search_blocked(
        cemb, csubdf, k=K, n_corpus=N, n_probes=N_PROBE_RECALL
    ).toPandas()
    hits = sum(
        len(
            set(got[got.query_id == q].vec_id)
            & set(cex[cex.query_id == q].neighbor_id)
        )
        for q in range(N_PROBE_RECALL)
    )
    out["ivfpq_recall_at_k"] = round(hits / (N_PROBE_RECALL * K), 3)

    # exact baseline on the clustered corpus for the same queries
    cqdf = spark.createDataFrame(
        [(int(i), [float(x) for x in r]) for i, r in enumerate(cq)],
        "query_id long, qemb array<double>",
    ).localCheckpoint(eager=True)
    _noop(exact_search_blocked(cemb, cqdf, k=K, n_corpus=N, n_probes=NQ))
    t0 = time.perf_counter()
    _noop(exact_search_blocked(cemb, cqdf, k=K, n_corpus=N, n_probes=NQ))
    cex_sec = time.perf_counter() - t0
    out["exact_clustered_sec"] = round(cex_sec, 2)
    out["exact_clustered_qps"] = round(NQ / cex_sec, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
