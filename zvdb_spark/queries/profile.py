"""Table-statistics collection (ANALYZE): per-column row/null/
distinct counts, numeric ranges, and string length stats in ONE scan.

Every mature engine ships this as a first-class command (ANSI/Spark
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``, DuckDB/Postgres
``ANALYZE``): the stats feed the optimizer's cardinality estimates
and are the first health-check a pipeline runs over a new corpus
drop. The reference has no statistics surface at all (its only
metadata is the vector count, ``src/hnsw.zig:52-71``); this module
provides the engine-level equivalent over any table.

Shape: one ``agg`` computes every column's stats in a single pass —
counts and min/max are plain partial aggregates (map-side combined,
one tiny shuffle), and the per-column exact ``countDistinct`` set
compiles to ONE expand-based aggregate (k-fold row expansion, still
one shuffle), not k separate jobs. The wide 1-row result is then
unpivoted driver-free via ``stack()`` into the long (one row per
column) form ANALYZE outputs. At 100 TB the drop-in change is
``approx_count_distinct`` for the distinct column — HLL sketches
merge without the expand — which q_agg_approx_distinct already
demonstrates with a pinned error bound; the declared query keeps
EXACT distincts so the DuckDB twin can check every cell.

Numeric ranges publish as double, timestamps as epoch days, string
ranges as the strings themselves — typed columns, no stringified
floats to format-mismatch across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load

# column -> kind; drives both the Spark agg and the DuckDB twin
_ORDERS_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)

_EPOCH = "1970-01-01"


def _duck_col_stats(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(min({col}) AS DOUBLE)"
        mx = f"CAST(max({col}) AS DOUBLE)"
        avg_len = "CAST(NULL AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn = f"CAST(date_diff('day', DATE '{_EPOCH}', min({col})) AS DOUBLE)"
        mx = f"CAST(date_diff('day', DATE '{_EPOCH}', max({col})) AS DOUBLE)"
        avg_len = "CAST(NULL AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        avg_len = f"round(avg(length({col})), 4)"
        mns, mxs = f"min({col})", f"max({col})"
    return f"""
SELECT '{col}' AS col_name,
       count(*) AS n_rows,
       count(*) - count({col}) AS n_null,
       count(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num,
       {mx} AS max_num,
       {mns} AS min_str,
       {mxs} AS max_str,
       {avg_len} AS avg_len
FROM orders"""


TABLE_STATS_ORACLE = (
    "\nUNION ALL\n".join(
        _duck_col_stats(c, k) for c, k in _ORDERS_COLS
    )
    + "\nORDER BY col_name"
)


def table_stats(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """ANALYZE over ``df``: one single-pass agg (all columns' stats
    as one wide row), unpivoted to long form with ``stack``. Works on
    any DataFrame — the declared query below binds it to orders."""
    aggs = []
    for c, kind in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
        ]
        if kind == "num":
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            ]
        elif kind == "ts":
            aggs += [
                F.datediff(F.min(c), F.lit(_EPOCH))
                .cast("double").alias(f"{c}__min"),
                F.datediff(F.max(c), F.lit(_EPOCH))
                .cast("double").alias(f"{c}__max"),
            ]
        else:
            aggs += [
                F.min(c).alias(f"{c}__mins"),
                F.max(c).alias(f"{c}__maxs"),
                F.round(F.avg(F.length(c)), 4).alias(f"{c}__avglen"),
            ]
    wide = df.agg(*aggs)
    # stack(): one struct row per column, typed nulls where a stat
    # doesn't apply — the unpivot happens inside the same job
    parts = []
    for c, kind in cols:
        if kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mns, mxs = f"`{c}__mins`", f"`{c}__maxs`"
            al = f"`{c}__avglen`"
        else:
            mn, mx = f"`{c}__min`", f"`{c}__max`"
            mns, mxs = "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
            al = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"'{c}', `{c}__n`, `{c}__null`, `{c}__dist`, "
            f"{mn}, {mx}, {mns}, {mxs}, {al}"
        )
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_num, max_num, "
        "min_str, max_str, avg_len)"
    )
    return wide.selectExpr(stack).orderBy("col_name")


@register(
    "q_table_stats",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_profile.py against TABLE_STATS_ORACLE
    tags=("profile", "stats", "agg"),
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics over orders: row count,
    null count, exact distinct count, numeric/date range (dates as
    epoch days), and avg string length — one row per column from ONE
    scan (single agg + stack unpivot; the k countDistincts compile
    to one expand aggregate, not k jobs). See module docstring for
    the 100 TB posture (swap exact distinct for HLL)."""
    return table_stats(
        load(spark, sf_dir, "orders"), list(_ORDERS_COLS)
    )
