"""Driver contract for the zvdb_spark engine.

``entry(spark)`` runs the flagship exact-kNN query on sf0.001;
``queries()`` / ``oracle_sql()`` re-export the declared-query registry
(one entry per implemented operator from SURVEY.md §2, each with its
DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Robust against file-path-based import (spec_from_file_location):
# make the package importable regardless of the caller's sys.path.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from zvdb_spark.queries import registry as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact k-NN over embeddings at sf0.001.

    Exercises the reference's entire hot path — scan -> project ->
    squared-L2 kernel (src/hnsw.zig:182-192) -> top-k
    (src/hnsw.zig:194-236) — as one Catalyst plan.
    """
    from zvdb_spark.queries.vector import q_knn_exact

    return q_knn_exact(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
