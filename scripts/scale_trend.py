"""Scale-trend experiment: the graph-ANN-vs-exact crossover at 10x
bench scale, plus append-vs-rebuild delta cost.

Reproduces the measurements recorded in SCALING.md (ANN section):
at 100k x 128-d brute-force GEMM wins; at 1M the ef-bounded beam
must win — if it doesn't, something O(corpus) is hiding in the
per-task search path (exactly how the dense visited bitmap was
caught: 313 MB zeroed per task inverted the trend at 1M).

Usage: python scripts/scale_trend.py [n_rows] (default 1,000,000)
Writes one JSON line: build/pack sec, ann/exact sec + qps, recall,
append-vs-rebuild ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM, NQ, K, SEED, NPROBE = 128, 10_000, 10, 42, 200


def main() -> None:
    from zvdb_spark.operators.graph_ann import GraphIndex
    from zvdb_spark.session import get_session

    spark = get_session("scale_trend")
    n_clust = max(20, N // 500)  # bench.py's clustered-corpus formula

    def gen_clustered(n: int, seed: int, id_offset: int = 0):
        def _gen(batches):
            centers = np.random.default_rng(seed).random((n_clust, DIM))
            for pdf in batches:
                ids = pdf["id"].to_numpy() + id_offset
                rows = []
                for i in ids:
                    r = np.random.default_rng(seed + 1 + int(i))
                    c = int(r.integers(0, n_clust))
                    rows.append(centers[c] + 0.08 * r.standard_normal(DIM))
                yield pd.DataFrame({"vec_id": ids, "emb": rows})

        return (
            spark.range(n)
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(_gen, "vec_id long, emb array<double>")
        )

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    out: dict = {"n": N, "dim": DIM, "nq": NQ, "k": K}
    emb = gen_clustered(N, SEED + 1).localCheckpoint(eager=True)
    idx = GraphIndex(m=16, ef=128, seed=SEED)
    out["build_sec"] = round(timed(lambda: idx.build(emb, n_rows=N)), 1)
    out["pack_sec"] = round(timed(idx.state), 1)

    centers = np.random.default_rng(SEED + 1).random((n_clust, DIM))
    qr = np.random.default_rng(SEED + 7)
    qs = centers[qr.integers(0, n_clust, NQ)] + 0.08 * qr.standard_normal(
        (NQ, DIM)
    )
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(NQ), "qemb": list(qs)})
    ).localCheckpoint(eager=True)
    qp = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(NPROBE), "qemb": list(qs[:NPROBE])})
    ).localCheckpoint(eager=True)

    noop(idx.search(qdf, k=K, n_queries=NQ))  # warm
    ann_sec = min(
        timed(lambda: noop(idx.search(qdf, k=K, n_queries=NQ)))
        for _ in range(3)
    )
    noop(idx.exact_search(qdf, k=K, n_queries=NQ))  # warm
    ex_sec = min(
        timed(lambda: noop(idx.exact_search(qdf, k=K, n_queries=NQ)))
        for _ in range(3)
    )
    out["ann_sec"] = round(ann_sec, 2)
    out["ann_qps"] = round(NQ / ann_sec, 0)
    out["exact_f32_sec"] = round(ex_sec, 2)
    out["exact_f32_qps"] = round(NQ / ex_sec, 0)
    out["graph_beats_exact"] = ann_sec < ex_sec

    ann_pdf = idx.search(qp, k=K, n_queries=NPROBE).toPandas()
    ex_pdf = idx.exact_search(
        qp, k=K, dtype="float64", n_queries=NPROBE
    ).toPandas()
    hits = sum(
        len(
            set(ann_pdf[ann_pdf.query_id == q]["vec_id"])
            & set(ex_pdf[ex_pdf.query_id == q]["neighbor_id"])
        )
        for q in range(NPROBE)
    )
    out["ann_recall"] = round(hits / (NPROBE * K), 3)

    n_delta = N // 10
    delta = gen_clustered(n_delta, SEED + 99, id_offset=N).localCheckpoint(
        eager=True
    )
    out["append_sec"] = round(
        timed(lambda: (idx.append(delta), idx.state())), 1
    )
    both = emb.unionAll(delta).localCheckpoint(eager=True)
    idx2 = GraphIndex(m=16, ef=128, seed=SEED)
    out["rebuild_sec"] = round(
        timed(lambda: (idx2.build(both, n_rows=N + n_delta), idx2.state())), 1
    )
    out["append_over_rebuild"] = round(out["append_sec"] / out["rebuild_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
