"""Time every declared query at sf0.01 (driver-correctness conditions).

Prints per-query wall seconds (Spark side only — the driver also runs a
DuckDB oracle per query, which is cheap) and the total, slowest-first.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from zvdb_spark.queries.registry import queries  # noqa: E402
from zvdb_spark.session import get_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_session("time_sweep")
    times: dict[str, float] = {}
    t_all = time.time()
    for name, fn in queries().items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            n = df.count()
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"[:200]
        times[name] = round(time.time() - t0, 2)
        print(f"{times[name]:8.2f}s  {n:>8}  {name}" + (f"  ERR {err}" if err else ""), flush=True)
    total = time.time() - t_all
    print(f"\nTOTAL {total:.1f}s for {len(times)} queries")
    print("slowest:", json.dumps(dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])))


if __name__ == "__main__":
    main()
