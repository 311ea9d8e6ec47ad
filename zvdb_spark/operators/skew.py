"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in the session) handles most skew
at runtime; ``salted_join`` is the explicit fallback for the cases AQE
can't re-plan (e.g. a skewed aggregation key feeding a join, or
builds where one key holds >1 executor-memory of rows).

``bucketed_coloc`` demonstrates the other shuffle eliminator: write
both sides bucketed by the join key so subsequent joins are
shuffle-free (sort-merge over pre-bucketed files) — at 100 TB you
bucket the fact tables once and amortize the shuffle over every
downstream join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed (left) side's key into
    ``n_salts`` sub-keys and explode the build (right) side once per
    salt, so one hot key spreads over n_salts reducers instead of one.

    Row multiplicity is preserved exactly (each left row carries one
    salt; each right row matches every salt) — semantics identical to
    ``left.join(right, key, how)`` for left-oriented joins. ``right``
    and ``full`` are rejected: the exploded right side would emit each
    unmatched right row once per salt. (To salt those, salt the right
    side and explode the left instead.)
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — "
            "right/full would duplicate unmatched right rows n_salts times"
        )
    salt = (F.crc32(F.monotonically_increasing_id().cast("string")) % n_salts).cast(
        "int"
    )
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_s.join(r_s, [key, "_salt"], how).drop("_salt")


def bucketed_coloc(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_buckets: int,
    table_prefix: str,
) -> tuple[DataFrame, DataFrame]:
    """Persist both sides bucketed by the join key and return the
    bucketed reads: joins between them shuffle nothing (bucket
    co-location replaces the Exchange)."""
    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    # The default in-memory catalog is PER-SESSION but the managed
    # table's physical location persists: DROP TABLE IF EXISTS in a
    # fresh session is a no-op on an unknown table, and the stale
    # directory then fails saveAsTable with LOCATION_ALREADY_EXISTS.
    # Clear both the catalog entry and the location — via the Hadoop
    # FileSystem API, so percent-encoded local URIs and shared
    # warehouses (hdfs:/s3a:) are handled by the scheme's own FS
    # instead of a string-stripped local rmtree that silently no-ops
    # on them.
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for name, df in ((lt, left), (rt, right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = jvm.org.apache.hadoop.fs.Path(wh, name)
        loc.getFileSystem(hconf).delete(loc, True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    return spark.table(lt), spark.table(rt)
