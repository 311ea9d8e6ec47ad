"""Parquet table sources.

The reference engine has no sources at all — data enters only via
``insert(point)`` from process memory (``src/hnsw.zig:73``). Here every
table is a Parquet scan through Spark's DataSource V2 path, which gives
predicate pushdown, column pruning and partition pruning for free; at
100 TB these tables would be directory-partitioned (e.g. orders by
month) and the same ``spark.read.parquet`` call prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
DIM_TABLES = ("region", "nation", "supplier")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (schema from footers).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). We read it
    as raw long nanoseconds (``spark.sql.legacy.parquet.nanosAsLong``)
    and truncate to microsecond TIMESTAMP with integer division —
    bit-identical to DuckDB's ``ts::TIMESTAMP`` ns->us truncation, so
    oracle parity holds. (Double division would lose precision at
    1.7e18 ns; ``div`` stays in long arithmetic.)
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL path."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
