"""Join declared queries: equi (inner/broadcast), outer, semi, anti,
range (non-equi), and as-of.

The reference's only join-shaped operation is the similarity probe
(``src/hnsw.zig:194-236``, covered in queries/vector.py); the
relational joins here are engine capability beyond it.

Scale notes: dimension joins (nation/region, and any sub-threshold
side) go through BroadcastHashJoin — no shuffle of the fact side;
fact-fact joins (orders x customer at 100 TB) shuffle on the join key
where AQE handles skew splitting. The range/as-of joins are
partition-bounded by the equality key (user_id), so the non-equi
condition is evaluated only within co-partitioned groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load

# Events CTE used by every oracle touching events: truncate the ns
# timestamp to microseconds exactly like the Spark loader does.
EVENTS_CTE = (
    "ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, "
    "value, props FROM events)"
)


@register(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_name, n.n_name, r.r_name, o.o_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_totalprice > 400000
""",
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way inner join orders⋈customer⋈nation⋈region. nation/region
    are under the broadcast threshold -> BHJ; orders⋈customer is the
    only shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "c_name", "n_name", "r_name", "o_totalprice")
    )


@register(
    "q_join_broadcast",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_acctbal > 9000
""",
    tags=("join", "broadcast"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension tables: zero shuffle — the
    customer scan never moves, each task hash-probes the broadcast
    maps. At 100 TB of customers this is still the right plan (nation
    and region are fixed-size)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "q_join_left",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 350000) o
  ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
""",
    tags=("join", "outer"),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: BUILDING customers with (possibly absent)
    large finished orders — exercises null-producing join rows."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 350000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi_anti",
    oracle="""
SELECT 'semi' AS how, c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        AND o.o_totalprice > 300000
)
UNION ALL
SELECT 'anti' AS how, c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
)
""",
    tags=("join", "semi", "anti"),
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS: customers having a large urgent order)
    and left-anti join (NOT EXISTS: customers with no very large
    order), declared as one tagged result — both physical join types
    execute in the one plan."""
    c = load(spark, sf_dir, "customer")
    o_urgent = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    o_big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    semi = (
        c.join(o_urgent, c.c_custkey == o_urgent.o_custkey, "left_semi")
        .select(F.lit("semi").alias("how"), "c_custkey", "c_name")
    )
    anti = (
        c.join(o_big, c.c_custkey == o_big.o_custkey, "left_anti")
        .select(F.lit("anti").alias("how"), "c_custkey", "c_name")
    )
    return semi.unionAll(anti)


@register(
    "q_join_range",
    oracle=f"""
WITH {EVENTS_CTE}
SELECT e.event_id, count(v.event_id) AS n_views_before
FROM ev e
LEFT JOIN ev v
  ON v.user_id = e.user_id
 AND v.event_type = 'view'
 AND v.ts >= e.ts - INTERVAL 10 MINUTE
 AND v.ts <  e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
    tags=("join", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: for each error event, how many views the
    same user made in the preceding 10 minutes. The equality key
    (user_id) bounds the non-equi predicate to co-partitioned groups —
    this stays a hash-partitioned join at scale, not a crossJoin."""
    ev = load(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("event_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    joined = e.join(
        v,
        (F.col("v_user") == F.col("e_user"))
        & (F.col("v_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("v_ts") < F.col("e_ts")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("v_id").alias("n_views_before")
    )


@register(
    "q_join_asof",
    oracle=f"""
WITH {EVENTS_CTE},
p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
j AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         date_diff('microseconds', c.ts, p.ts) AS gap_us,
         row_number() OVER (
           PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts < p.ts
)
SELECT purchase_id, click_id, gap_us FROM j WHERE rn = 1
""",
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the same user's latest
    strictly-prior click (backward as-of). SURVEY §2.2 sketched this
    over orders x events, but the synthetic orders (1995-2001) and
    events (2024) date ranges don't overlap — an order's "latest prior
    event" would always be empty — so the declared as-of runs
    events-to-events, which exercises the identical operator shape.
    Expressed as a bounded range join + pick-latest window, the
    standard Spark formulation;
    at scale the window's group-limit optimization keeps one row per
    purchase past the shuffle."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    return (
        p.join(c, (F.col("c_user") == F.col("p_user")) & (F.col("c_ts") < F.col("p_ts")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "click_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
    )
