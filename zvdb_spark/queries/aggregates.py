"""Aggregation declared queries: group-by, distinct, rollup, cube.

No aggregation exists anywhere in the reference (SURVEY.md §2.2).
Spark executes all of these as partial (map-side) + final aggregation
automatically — at 100 TB the shuffle carries one row per (group,
partition), not per input row.

All float sums go through DECIMAL(18,4) (exact for the 2-decimal
testdata money columns) and are cast back to double, making them
bit-identical to the DuckDB oracle regardless of accumulation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent exact sum of a clean-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


# Oracle-side twin of dsum.
def _dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


@register(
    "q_agg_groupby",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_dsum_sql('l_quantity')} AS sum_qty,
       {_dsum_sql('l_extendedprice')} AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1-l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_price,
       round({_dsum_sql('l_quantity')} / count(*), 4) AS avg_qty,
       round({_dsum_sql('l_discount')} / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg",),
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-aggregate group-by with
    partial+final hash aggregation."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
        F.round(dsum("l_quantity") / F.count("*"), 4).alias("avg_qty"),
        F.round(dsum("l_discount") / F.count("*"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count(DISTINCT) — Spark expands to a partial-distinct
    aggregate (Expand + two-phase agg); exact, unlike the
    approx_count_distinct bench variant."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_agg_rollup",
    oracle="""
SELECT coalesce(r.r_name, 'ALL') AS region_name,
       coalesce(n.n_name, 'ALL') AS nation_name,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
    tags=("agg", "rollup"),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation-within-region ROLLUP (subtotals + grand
    total). Rollup nulls are coalesced to 'ALL' so the group-marker is
    unambiguous in both engines (names are never null in the data)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(dsum("o_totalprice").alias("revenue"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "q_agg_cube",
    oracle="""
SELECT coalesce(event_type, 'ALL') AS etype,
       coalesce(strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d'), 'ALL') AS day,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE(event_type, strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d'))
""",
    tags=("agg", "cube"),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event count/value CUBE over type x day (all four grouping
    sets). Day is pre-formatted to string so the grouping key is
    engine-neutral."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    return (
        ev.cube("event_type", "day")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n_events",
            "sum_value",
        )
    )


@register("q_agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts (the sketch variant
    of q_agg_distinct for 100 TB cardinalities, where exact distinct
    is a full shuffle but HLL is a fixed-size mergeable sketch).
    Engine-specific sketch -> rows-only check; the pytest suite bounds
    its error against the exact count instead."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@register("q_agg_approx_percentile", oracle=None, tags=("agg", "approx"))
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (the quantile sibling of
    q_agg_approx_distinct): ``approx_percentile`` runs the
    Greenwald-Khanna mergeable summary — each partition keeps a
    bounded summary, the merge is one tiny shuffle — where the exact
    percentile (q_agg_percentile) must globally sort each group. At
    100 TB the exact form's per-group sort is the bottleneck; the
    sketch's accuracy parameter trades summary size for rank error.
    Publishes sketch and exact side by side (like the HLL query), so
    the error is visible in the artifact itself; the pytest suite
    pins the rank-error bound. Engine-specific sketch -> rows-only."""
    acc = 10_000  # GK accuracy: rank error <= n / acc per group
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "approx_percentile(l_extendedprice, "
                f"array(0.5, 0.95, 0.99), {acc})"
            ).alias("approx_p"),
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
            ).alias("exact_p"),
        )
        .select(
            "l_returnflag",
            "n",
            F.round(F.col("approx_p")[0], 2).alias("approx_p50"),
            F.round(F.col("approx_p")[1], 2).alias("approx_p95"),
            F.round(F.col("approx_p")[2], 2).alias("approx_p99"),
            F.round(F.col("exact_p")[0], 2).alias("exact_p50"),
            F.round(F.col("exact_p")[1], 2).alias("exact_p95"),
            F.round(F.col("exact_p")[2], 2).alias("exact_p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_pivot",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_pending,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS rev_open
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts and revenue by market
    segment x order status. Spark's pivot() compiles to the same
    conditional-aggregation the oracle writes explicitly — one
    shuffle, columns fixed up front (required at scale: an unbounded
    pivot key set would need a driver-side distinct first)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    piv = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
        )
    )
    return piv.select(
        "c_mktsegment",
        F.col("O_n").alias("n_open"),
        F.col("F_n").alias("n_finished"),
        F.col("P_n").alias("n_pending"),
        F.col("O_rev").cast("double").alias("rev_open"),
    )


@register(
    "q_subquery_scalar",
    oracle="""
SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT avg(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
) * 1.8
""",
    tags=("agg", "subquery"),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers with balance >1.8x their
    nation's average. Catalyst decorrelates this into an aggregate +
    join (RewriteCorrelatedScalarSubquery) — expressed via SQL so the
    rewrite itself is exercised."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
        FROM customer_v c
        WHERE c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer_v c2
          WHERE c2.c_nationkey = c.c_nationkey
        ) * 1.8
        """
    )


@register(
    "q_agg_percentile",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice, o.o_orderkey) AS rn,
         count(*)     OVER (PARTITION BY c.c_mktsegment) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       round(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN o_totalprice END), 2) AS median_price,
       round(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END), 2) AS p90_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM j GROUP BY c_mktsegment
""",
    tags=("agg", "percentile"),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles per group (the k-th order statistic,
    k = ceil(p*n)): median and p90 of order value by segment. Discrete
    (an actual data value) rather than interpolated — interpolated
    medians of 2-decimal data land exactly on half-cent rounding
    boundaries where engines legitimately differ by 1 ulp. Exact
    percentile is a windowed sort per group; the sketch alternative at
    100 TB is approx_percentile (cf. q_agg_approx_distinct)."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_totalprice", "o_orderkey"
    )
    w = W.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    wn = W.partitionBy("c_mktsegment")
    r = j.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    kth = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
            F.col("o_totalprice"),
        )
    )
    return r.groupBy("c_mktsegment").agg(
        F.round(kth(0.5), 2).alias("median_price"),
        F.round(kth(0.9), 2).alias("p90_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


# --- ordered-funnel analytics (view -> click -> purchase) ---

FUNNEL_STAGES = ("view", "click", "purchase")

# Per-user funnel state machine: one pass over the time-sorted event
# sequence. Strict ts comparisons make the semantics identical to the
# oracle's "first click strictly after first view, first purchase
# strictly after that click" min-formulation even under same-timestamp
# ties (where sort order between types is alphabetical and would
# otherwise differ from the join formulation).
_FUNNEL_STATE = """
aggregate(
  array_sort(seq),
  named_struct(
    't1', cast(null as timestamp),
    't2', cast(null as timestamp),
    't3', cast(null as timestamp)),
  (a, x) -> named_struct(
    't1', IF(a.t1 IS NULL AND x.event_type = 'view', x.ts, a.t1),
    't2', IF(a.t2 IS NULL AND a.t1 IS NOT NULL
             AND x.event_type = 'click' AND x.ts > a.t1, x.ts, a.t2),
    't3', IF(a.t3 IS NULL AND a.t2 IS NOT NULL
             AND x.event_type = 'purchase' AND x.ts > a.t2, x.ts, a.t3)),
  a -> a)
"""

FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
  SELECT user_id, min(ts) AS v_ts FROM ev
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.v_ts GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.c_ts GROUP BY 1
)
SELECT
  (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
  (SELECT count(*) FROM s1) AS n_viewed,
  (SELECT count(*) FROM s2) AS n_clicked,
  (SELECT count(*) FROM s3) AS n_converted,
  (SELECT CAST(coalesce(sum(epoch_us(s3.p_ts) - epoch_us(s1.v_ts)), 0)
          AS BIGINT)
   FROM s3 JOIN s1 USING (user_id)) AS convert_us_sum
"""


@register(
    "q_events_funnel",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_curation_queries.py against FUNNEL_ORACLE
    tags=("agg", "funnel", "sequence"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): for each user, the
    first view, the first click strictly after it, and the first
    purchase strictly after that — computed as a state-machine
    ``aggregate`` HOF over the user's time-sorted event sequence, ONE
    shuffle total (the per-user collect), where the classic
    formulation needs three self-join + aggregate rounds (the oracle
    keeps that shape to prove equivalence). Conversion time is summed
    in exact integer microseconds.

    Scale: the per-user sequence is bounded by per-user activity (the
    same bound sessionization needs); a pathological power-user would
    call for pre-bucketing by (user, day) first. Everything after the
    collect is codegen expression work; the final global rollup moves
    one row per user."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .select("user_id", "ts", "event_type")
    )
    per_user = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "event_type")).alias("seq")
    )
    st = per_user.select(F.expr(_FUNNEL_STATE).alias("st"))
    return st.agg(
        F.count("*").alias("n_users"),
        F.count("st.t1").alias("n_viewed"),
        F.count("st.t2").alias("n_clicked"),
        F.count("st.t3").alias("n_converted"),
        F.coalesce(
            F.sum(F.expr("unix_micros(st.t3) - unix_micros(st.t1)")),
            F.lit(0),
        ).cast("bigint").alias("convert_us_sum"),
    )


FREQ_SUPPORT_PM = 33  # support in per-mille: integer-exact thresholds
FREQ_SUPPORT = FREQ_SUPPORT_PM / 1000  # floor(1/s)=30 counters < the
# fixture's 31-term vocabulary, so the sketch actually evicts — the
# guarantee test is exercised, not vacuously satisfied by an
# oversized counter table


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE tokenized term stream both heavy-hitter passes read —
    shared so the sketch's candidate universe and the verify pass's
    count universe can never silently diverge (a tokenization tweak
    applied to one but not the other would drop true heavy hitters
    while every superset test kept passing)."""
    return load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )


def freq_item_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw sketch pass: one-row candidate array from Spark's
    single-pass `DataFrame.freqItems` (Misra-Gries family) at support
    s. Superset-guaranteed, layout-SENSITIVE: merge order can change
    which false positives survive. Pytest pins the guarantee against
    exact counts (tests/test_pipeline_queries.py)."""
    return _doc_terms(spark, sf_dir).freqItems(
        ["term"], support=FREQ_SUPPORT
    )


@register(
    "q_agg_freq_items",
    oracle=None,  # past the driver cap; the sketch stage is pinned by
    # its superset-guarantee pytest, the verify stage by exact
    # recompute (tests/test_pipeline_queries.py)
    tags=("agg", "sketch"),
)
def q_agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters: a single-pass frequent-items sketch
    (Spark's `DataFrame.freqItems`, Misra-Gries family — GUARANTEED
    to include every term with frequency > s*N, possibly with false
    positives, never false negatives; Karp et al. 2003) nominates
    candidates, then ONE verify pass restricted to the candidate set
    computes exact counts and keeps true heavy hitters (integer
    cross-multiplied threshold cf*1000 > N*s_pm). At 100 TB this
    finds heavy hitters with a streaming aggregate plus a
    broadcast-filtered count — never materializing the full term
    frequency table `q_vocab_topk` builds.

    The published rows are the VERIFIED set — layout-stable (any
    sketch false-positive drift dies in the exact filter), so
    harnesses may record and re-compare them across runs and cluster
    sizes; the layout-sensitive raw candidate array stays in
    freq_item_candidates for its guarantee pytest."""
    tok = _doc_terms(spark, sf_dir)
    cand = freq_item_candidates(spark, sf_dir)
    n_tot = tok.agg(F.count("*").alias("n_tot"))
    return (
        tok.join(
            F.broadcast(cand),
            F.expr("array_contains(term_freqItems, term)"),
        )
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("cf") * 1000 > F.col("n_tot") * FREQ_SUPPORT_PM)
        .select("term", "cf")
    )
