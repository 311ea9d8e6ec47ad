"""Scan / filter / project / sort / top-k declared queries.

The reference has no relational surface at all (no scans, filters,
sorts beyond the k-NN result sort at ``src/hnsw.zig:227-233``); this
pack is the baseline relational capability mandated by the engine's
north star. Every query here compiles to a single whole-stage-codegen
span over a parquet scan with pushed filters/pruned columns — verify
with ``zvdb_spark.plans.explain_audit``.

Float-stability convention (applies to the whole registry): money
columns in the testdata are exact 2-decimal values, so sums are done
in DECIMAL(18,4) (associative, order-independent, exact) and cast
back to double — bitwise identical between Spark and the DuckDB
oracle regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import TABLES, load


@register(
    "q_scan_project",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in TABLES
    ),
    tags=("scan",),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan every testdata table (parquet source smoke): one row per
    table with its row count. Count-only scans read no columns
    (parquet footer row-group counts)."""
    out = None
    for t in TABLES:
        d = (
            load(spark, sf_dir, t)
            .groupBy()
            .agg(F.count("*").alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
        out = d if out is None else out.unionAll(d)
    return out


@register(
    "q_filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
    tags=("filter",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate + arithmetic projection (TPC-H Q6 shape,
    row-level). All three predicates push down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


def _topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — the relational twin of the reference's k-limit
    search heap (``src/hnsw.zig:202,211``). orderBy+limit compiles to
    TakeOrderedAndProject: per-partition heaps of size k, k-row merge,
    no full sort, no shuffle — the same plan shape at any scale."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register(
    "q_topk_sort",
    oracle=f"""
SELECT 'topk' AS src, o_orderkey AS k1, o_custkey AS k2,
       o_totalprice AS v1, NULL::DOUBLE AS v2, NULL::VARCHAR AS s1
FROM ({_TOPK_ORACLE})
UNION ALL
SELECT 'sort' AS src, l_orderkey AS k1, l_linenumber AS k2,
       l_quantity AS v1, l_extendedprice AS v2, l_returnflag AS s1
FROM (
  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice
  FROM lineitem
  ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC
  LIMIT 100
)
""",
    tags=("topk", "sort"),
)
def q_topk_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — the reference's k-limit
    heap, src/hnsw.zig:202,211) and a multi-key sort with full
    deterministic tiebreak, declared as one tagged result with an
    aligned schema."""
    topk = _topk_orders(spark, sf_dir).select(
        F.lit("topk").alias("src"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("k2"),
        F.col("o_totalprice").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
        F.lit(None).cast("string").alias("s1"),
    )
    sort_multi = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_extendedprice",
        )
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_quantity").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
        .select(
            F.lit("sort").alias("src"),
            F.col("l_orderkey").alias("k1"),
            F.col("l_linenumber").cast("long").alias("k2"),
            F.col("l_quantity").alias("v1"),
            F.col("l_extendedprice").alias("v2"),
            F.col("l_returnflag").alias("s1"),
        )
    )
    return topk.unionAll(sort_multi)


@register("q_sink_parquet", oracle=_TOPK_ORACLE, tags=("sink",))
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink roundtrip: write the top-k result out with the
    engine sink and read it back. The reference has no sinks at all
    (results are returned as an owned slice, src/hnsw.zig:235); this
    is the durable-output surface. Oracled: the roundtripped rows must
    hash-match the direct top-k oracle — a write that loses, dups, or
    retypes rows fails the check."""
    import tempfile

    from zvdb_spark.sources.sinks import read_result, write_result

    out = _topk_orders(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="zvdb_sink_")
    write_result(out, f"{tmp}/topk", n_files=1)
    return read_result(spark, f"{tmp}/topk")


@register(
    "q_source_formats",
    oracle=None,  # past the driver cap; cross-format parity pinned by
    # tests/test_pipeline_queries.py (checksums must agree exactly)
    tags=("sources", "formats"),
)
def q_source_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-connector parity across file formats: the customer
    table (int64/int32/string/double columns) is written out as CSV,
    JSON-lines, and ORC, each read back through an EXPLICIT schema — never
    inferSchema, which is a full extra scan per read at 100 TB and a
    type lottery besides — and summarized per format as (n_rows,
    key_sum, row_checksum), where row_checksum sums the portable
    md5-based hash of every row's canonical string form. Identical
    rows across parquet/csv/json/orc prove the connectors neither
    lose, duplicate, nor retype rows (the checksum catches a double
    that came back as a truncated decimal or a shifted column). The
    reference has no file sources at all — data enters only via
    ``insert`` from process memory (src/hnsw.zig:73) — so this is
    engine surface, not reference parity.

    Rows-only at the driver (4 summary rows; the comparison the
    driver would hash is exactly what the pytest suite asserts:
    all four rows agree and match the parquet footer count).
    """
    import shutil
    import tempfile

    from zvdb_spark.queries.text import checksum_sum

    base = load(spark, sf_dir, "customer")
    cols = base.columns
    # Null-safe canonical row form: concat_ws SKIPS nulls, which would
    # make ('a', NULL, 'x') collide with a column-shifted ('a', 'x',
    # NULL) — exactly the corruption the checksum exists to catch —
    # so every column carries an explicit NULL sentinel. The checksum
    # is the shared overflow-free recipe (text.py:checksum_sum).
    canon = ", ".join(
        f"coalesce(cast({c} as string), '<NULL>')" for c in cols
    )

    def _summary(df: DataFrame, fmt: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum("c_custkey").alias("key_sum"),
            checksum_sum(f"concat_ws('|', {canon})").alias("row_checksum"),
        ).select(F.lit(fmt).alias("format"), "*")

    tmp = tempfile.mkdtemp(prefix="zvdb_sources_")
    try:
        # CSV must round-trip NULL and '' DISTINGUISHABLY: by default
        # Spark writes both as empty and reads empty back as null, so
        # an empty-string value in the fixture would silently flip to
        # NULL and break cross-format checksum parity with a confusing
        # mismatch. Explicit disjoint markers close that hole.
        # write: null -> \N marker, '' -> quoted ""; read: only the
        # null marker maps back (the parser already reads a quoted
        # empty field as '') — verified: (x, '', NULL) round-trips
        base.write.mode("overwrite").option("header", "true").option(
            "nullValue", "\\N"
        ).option("emptyValue", '""').csv(f"{tmp}/csv")
        base.write.mode("overwrite").json(f"{tmp}/json")
        base.write.mode("overwrite").orc(f"{tmp}/orc")
        csv_df = (
            spark.read.schema(base.schema)
            .option("header", "true")
            .option("nullValue", "\\N")
            .csv(f"{tmp}/csv")
        )
        json_df = spark.read.schema(base.schema).json(f"{tmp}/json")
        orc_df = spark.read.schema(base.schema).orc(f"{tmp}/orc")
        return (
            _summary(base, "parquet")
            .unionByName(_summary(csv_df, "csv"))
            .unionByName(_summary(json_df, "json"))
            .unionByName(_summary(orc_df, "orc"))
            .orderBy("format")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
