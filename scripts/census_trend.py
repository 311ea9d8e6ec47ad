"""Census-premium scale trend: what the LSH hot-bucket census costs
on an UNSKEWED corpus (cap never fires) as the band table grows.

Reproduces the SCALING.md numbers: bounded_band_pairs vs the
uncensused naive self-join, interleaved best-of-2 per size. The
premium is dominated by fixed per-job cost (census job + max()
round-trip) and falls as the linear work grows — the asymptotic cost
is one map-side-combined partial-agg pass over data the join scans
anyway.

Usage: python scripts/census_trend.py [n_docs ...] (default
25k 100k 400k 1.6M). Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (
    [int(a) for a in sys.argv[1:]]
    if len(sys.argv) > 1
    else [25_000, 100_000, 400_000, 1_600_000]
)


def main() -> None:
    from pyspark.sql import functions as F

    from zvdb_spark.operators.banding import bounded_band_pairs
    from zvdb_spark.session import get_session

    spark = get_session("census_trend")
    n_bands, bucket = 8, 4

    def measure(n_docs: int, passes: int = 2) -> dict:
        bands = (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"))
            .crossJoin(
                spark.range(n_bands).select(F.col("id").alias("band_idx"))
            )
            .select(
                "doc_id",
                "band_idx",
                F.pmod(
                    F.xxhash64("doc_id", "band_idx"),
                    F.lit(n_docs // bucket),
                ).alias("key"),
            )
            .localCheckpoint(eager=True)
        )

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        a = bands.select(F.col("doc_id").alias("ia"), "band_idx", "key")
        b = bands.select(F.col("doc_id").alias("ib"), "band_idx", "key")
        raw = bnd = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            noop(
                a.join(b, ["band_idx", "key"])
                .filter(F.col("ia") < F.col("ib"))
                .select("ia", "ib")
                .distinct()
            )
            raw = min(raw, time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(bounded_band_pairs(bands, "doc_id", ["band_idx", "key"]))
            bnd = min(bnd, time.perf_counter() - t0)
        bands.unpersist()
        return {
            "n_docs": n_docs,
            "band_rows": n_docs * n_bands,
            "raw_sec": round(raw, 3),
            "bounded_sec": round(bnd, 3),
            "overhead_pct": round(100 * (bnd - raw) / raw, 1),
        }

    print(json.dumps([measure(n) for n in SIZES]))
    spark.stop()


if __name__ == "__main__":
    main()
