"""Skew-salting correctness + bucketed co-located join shuffle audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from zvdb_spark.operators.skew import bucketed_coloc, salted_join
from zvdb_spark.plans import plan_audit
from zvdb_spark.sources.tables import load


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("s"))
        .head()
    )
    salted = (
        salted_join(orders, customer, "o_custkey", n_salts=4)
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("s"))
        .head()
    )
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
        customer = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_name"
        )
        lb, rb = bucketed_coloc(spark, orders, customer, "o_custkey", 4, "tbkt")
        joined = lb.join(rb, "o_custkey")
        audit = plan_audit(joined)
        assert audit["n_exchanges"] == 0, audit["plan"][:1500]
        assert joined.count() == orders.join(customer, "o_custkey").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS tbkt_l")
        spark.sql("DROP TABLE IF EXISTS tbkt_r")


def test_q_join_skew_salted_matches_oracle(spark, sf_dir):
    """The declared query's result contract is the PLAIN join — the
    salting is a physical rewrite only."""
    from tests.oracle_utils import assert_matches_oracle
    from zvdb_spark.queries.joins import SKEW_SALTED_ORACLE, q_join_skew_salted

    assert_matches_oracle(
        q_join_skew_salted(spark, sf_dir), SKEW_SALTED_ORACLE, sf_dir
    )


def test_q_join_skew_salted_plan_joins_on_salt(spark, sf_dir):
    """The executed plan must actually join on (key, salt) — i.e. the
    rewrite is in the plan, not optimized away."""
    from zvdb_spark.queries.joins import q_join_skew_salted

    plan = (
        q_join_skew_salted(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan, plan


def test_q_join_bucketed_matches_oracle(spark, sf_dir):
    """The declared query's result contract is the plain join — the
    bucketed layout only changes the physical meeting point."""
    from tests.oracle_utils import assert_matches_oracle
    from zvdb_spark.queries.joins import BUCKETED_ORACLE, q_join_bucketed

    try:
        assert_matches_oracle(
            q_join_bucketed(spark, sf_dir), BUCKETED_ORACLE, sf_dir
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS zvdb_bkt_l")
        spark.sql("DROP TABLE IF EXISTS zvdb_bkt_r")


def test_q_join_bucketed_join_is_exchange_free(spark, sf_dir):
    """With broadcast disabled, the bucketed sides must join with
    ZERO Exchange — the bucket co-location IS the shuffle."""
    from zvdb_spark.operators.skew import bucketed_coloc
    from zvdb_spark.plans.audit import plan_audit

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        c = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_nationkey"
        )
        lb, rb = bucketed_coloc(spark, o, c, "o_custkey", 8, "zvdb_bkt2")
        audit = plan_audit(lb.join(rb, "o_custkey"))
        assert audit["n_exchanges"] == 0, audit["plan"][:1500]
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS zvdb_bkt2_l")
        spark.sql("DROP TABLE IF EXISTS zvdb_bkt2_r")
