"""Scalar-function declared queries: string, date/time, JSON.

(The math and array packs live in queries/vector.py as
q_vector_array_funcs, generalizing the reference's one scalar kernel
at ``src/hnsw.zig:182-192``.)

All pure row-level expressions — single codegen stage over the scan,
no shuffle. Booleans are cast to int and timestamps formatted to
strings so the oracle hash is engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load


@register(
    "q_str_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_name, 1, 4) AS name_pfx,
       concat(p_brand, ':', p_type) AS brand_type,
       CAST(p_name LIKE '%bolt%' AS INT) AS is_bolt,
       replace(p_name, ' ', '_') AS name_snake,
       CAST(strpos(p_name, 'e') AS INT) AS first_e
FROM part
""",
    tags=("scalar", "string"),
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function pack over part names: case, length, substring,
    concat, LIKE, replace, position."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%bolt%").cast("int").alias("is_bolt"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.instr(F.col("p_name"), "e").alias("first_e"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(dayofweek(o_orderdate) AS INT) AS order_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS INT) AS days_since_epoch0,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time-function pack over order dates: extract fields,
    truncation, day arithmetic, intervals.

    Note: DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is
    1=Sunday..7 — aligned by subtracting 1 on the Spark side.
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        (F.dayofweek(d) - 1).alias("order_dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch0"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
    )


@register(
    "q_json_extract",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       round(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 1.0 / count(*), 4) AS avg_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the semi-structured props JSON column and aggregate the
    extracted integer key — exact integer arithmetic end to end."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.round(F.sum(k) * F.lit(1.0) / F.count("*"), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )
