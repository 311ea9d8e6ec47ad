"""Any-offset span-dedup cost experiment: span_dedup_stride at
s in {K, K/2, 1} on the real documents table.

Reproduces the SCALING.md numbers behind the q_dedup_spans_s1 entry:
window-row expansion is exactly the start-count ratio (floor((n-K)/s)
+ 1 per doc), wall-clock is what the extra rows cost through the one
span-hash shuffle. All three settings timed back-to-back per pass x 2
passes in one shared load window (the bench.py ratio discipline).

Usage: python scripts/stride_cost.py [sf_dir] (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1). Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)


def main() -> None:
    from pyspark.sql import functions as F

    from zvdb_spark.queries.vocab import SPAN_K, span_dedup_stride
    from zvdb_spark.session import get_session
    from zvdb_spark.sources.tables import load

    spark = get_session("stride_cost")
    k = SPAN_K
    strides = (k, k // 2, 1)

    # window-row counts (exact, cheap): floor((n-K)/s)+1 per doc >= K
    toks = load(spark, SF_DIR, "documents").select(
        F.size(F.split("text", " ")).alias("n")
    )
    n_docs = toks.count()
    rows = {}
    for s in strides:
        rows[s] = (
            toks.filter(F.col("n") >= k)
            .select(
                (((F.col("n") - k) / s).cast("int") + 1).alias("w")
            )
            .agg(F.sum("w"))
            .head()[0]
        )

    def _run(s: int) -> None:
        span_dedup_stride(spark, SF_DIR, k=k, s=s).write.format(
            "noop"
        ).mode("overwrite").save()

    _run(k)  # warmup: python workers + parquet page-in
    secs = {s: float("inf") for s in strides}
    for _ in range(2):
        for s in strides:
            t0 = time.perf_counter()
            _run(s)
            secs[s] = min(secs[s], time.perf_counter() - t0)

    out = {
        "sf_dir": SF_DIR,
        "k": k,
        "n_docs": n_docs,
        "points": [
            {
                "s": s,
                "window_rows": int(rows[s]),
                "rows_ratio_vs_aligned": round(rows[s] / rows[k], 2),
                "wall_sec": round(secs[s], 3),
                "wall_ratio_vs_aligned": round(secs[s] / secs[k], 2),
            }
            for s in strides
        ],
        "shared_load_window": "2 interleaved passes, best-of-2",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
