"""Set-operation declared query: union, except all, intersect all.

Absent from the reference (SURVEY.md §2.2). UNION DISTINCT and the
bag-semantics ALL variants both reduce to hash aggregation on the full
row — one shuffle on the row key at any scale.

The three operators are declared as ONE query (tagged union of their
results) so each keeps full driver-oracle coverage within the driver's
50-query check cap (see queries/registry.py:QUERY_ORDER).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load


def _set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): building-segment customers ∪ big-order
    customers."""
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.union(b).distinct()


def _set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each customer's order multiplicity
    minus their urgent-order multiplicity."""
    all_o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return all_o.exceptAll(urgent)


def _set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per-customer min(multiplicity)
    of early-era vs late-era orders."""
    early = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    late = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    return early.intersectAll(late)


@register(
    "q_set_ops",
    oracle="""
SELECT 'union' AS op, custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
)
UNION ALL
SELECT 'except' AS op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders
  EXCEPT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT 'intersect' AS op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
  INTERSECT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
""",
    tags=("setop",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three set operators in one declared result, each branch
    tagged: UNION distinct / EXCEPT ALL / INTERSECT ALL."""
    u = _set_union(spark, sf_dir).select(F.lit("union").alias("op"), "custkey")
    e = _set_except(spark, sf_dir).select(F.lit("except").alias("op"), "custkey")
    i = _set_intersect(spark, sf_dir).select(
        F.lit("intersect").alias("op"), "custkey"
    )
    return u.unionAll(e).unionAll(i)
