#!/usr/bin/env python
"""Focused profiling harness for the 1M-scale bench sections — the
round-13 optimization loop's fast iteration tool (the full bench is
~23 min; this reproduces the ivfpq_1m / graph_1m shapes in isolation
with per-stage timing so each optimization's effect is attributable).

Usage: python scripts/profile_1m.py [n_scale]
  n_scale defaults to 10 (the bench's 10x = 1M); pass 3 for a quick
  300k iteration loop.

Prints one JSON line with per-stage seconds.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_N = 100_000
BENCH_DIM = 128
SEED = 42
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nq1 = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    from zvdb_spark.operators.graph_ann import GraphIndex
    from zvdb_spark.operators.kmeans import kmeans_fit_sample
    from zvdb_spark.operators.knn import exact_search_blocked
    from zvdb_spark.operators.pq import (
        exact_rerank,
        ivfpq_build,
        pq_search_ivf,
    )
    from zvdb_spark.session import get_session

    spark = get_session("zvdb_profile_1m", cpus=CPUS)
    out: dict = {"n_scale": scale, "nq": nq1}

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    n1 = scale * BENCH_N
    nc1 = max(20, n1 // 500)
    import pandas as pd

    def _gen1(batches):
        centers = np.random.default_rng(SEED + 1).random((nc1, BENCH_DIM))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                r = np.random.default_rng(SEED + 1 + int(i))
                c = int(r.integers(0, nc1))
                rows.append(centers[c] + 0.08 * r.standard_normal(BENCH_DIM))
            yield pd.DataFrame({"vec_id": ids, "emb": rows})

    t0 = time.perf_counter()
    cemb1 = (
        spark.range(n1)
        .repartition(CPUS)
        .mapInPandas(_gen1, "vec_id long, emb array<double>")
        .localCheckpoint(eager=True)
    )
    out["gen_corpus"] = round(time.perf_counter() - t0, 2)

    c1 = 4096 if scale >= 10 else max(256, n1 // 250)
    npr1, rr1 = 128, 400
    spark.sparkContext.setJobDescription("profile: kmeans_fit_sample")
    t0 = time.perf_counter()
    cents = kmeans_fit_sample(
        cemb1, k=c1, n_iter=6, sample_n=100_000, n_rows=n1
    )
    out["kmeans_fit"] = round(time.perf_counter() - t0, 2)

    spark.sparkContext.setJobDescription("profile: ivfpq_build")
    t0 = time.perf_counter()
    books, codes = ivfpq_build(
        cemb1, cents, m_sub=16, k_codes=256, n_iter=4,
        sample_n=20_000, n_rows=n1,
    )
    codes = codes.localCheckpoint(eager=True)
    out["ivfpq_encode_ckpt"] = round(time.perf_counter() - t0, 2)

    spark.sparkContext.setJobDescription("profile: graph build")
    t0 = time.perf_counter()
    gidx1 = GraphIndex(m=16, ef=128, seed=SEED).build(cemb1, n_rows=n1)
    gidx1.state()
    out["graph_build"] = round(time.perf_counter() - t0, 2)

    centers = np.random.default_rng(SEED + 1).random((nc1, BENCH_DIM))
    crng = np.random.default_rng(SEED + 7)
    cq = centers[crng.integers(0, nc1, nq1)] + 0.08 * crng.standard_normal(
        (nq1, BENCH_DIM)
    )

    def _qdf(qarr):
        q = np.ascontiguousarray(qarr, dtype=np.float64)
        return spark.createDataFrame(
            pd.DataFrame(
                {"query_id": np.arange(len(q), dtype=np.int64),
                 "qemb": list(q)}
            ),
            "query_id long, qemb array<double>",
        ).localCheckpoint(eager=True)

    def _ivfpq(qarr, k, cap):
        cand = pq_search_ivf(
            codes, books, cents, qarr, k=rr1, nprobe=npr1,
            residual=True, per_task_cap=cap,
        )
        return exact_rerank(cand, cemb1, qarr, k=k,
                            cand_rows=len(qarr) * rr1)

    n_warm = min(1000, nq1)
    qdf1 = _qdf(cq)
    qdf_warm = _qdf(cq[:n_warm])
    spark.sparkContext.setJobDescription("profile: warm")
    _noop(_ivfpq(cq[:n_warm], 10, rr1))
    _noop(exact_search_blocked(cemb1, qdf_warm, k=10, n_corpus=n1,
                               n_probes=n_warm))
    _noop(gidx1.search(qdf_warm, k=10, n_queries=n_warm))

    for name, fn in (
        ("exact", lambda: _noop(
            exact_search_blocked(cemb1, qdf1, k=10, n_corpus=n1,
                                 n_probes=nq1))),
        ("ivfpq_cap64", lambda: _noop(_ivfpq(cq, 10, 64))),
        ("ivfpq_cap400", lambda: _noop(_ivfpq(cq, 10, rr1))),
        ("graph", lambda: _noop(gidx1.search(qdf1, k=10, n_queries=nq1))),
    ):
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 2)

    gidx1.retire()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
