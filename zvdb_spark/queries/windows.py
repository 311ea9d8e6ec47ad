"""Window-function declared queries: ranking, lag/lead analytics,
range frames.

The reference's only window-shaped logic is the degenerate top-M
neighbor prune (``src/hnsw.zig:143-170``) — exactly a
``row_number() OVER (PARTITION BY node ORDER BY dist) <= M`` — and
the k-NN result rank. These queries generalize that to the full
ranking/analytic/frame surface.

Scale: Catalyst's InferWindowGroupLimit rewrites rank-filter patterns
into per-partition group limits before the shuffle, so top-n-per-group
moves n rows per key, not the whole group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.joins import EVENTS_CTE
from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load


@register(
    "q_window_rank",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn, prio_rank
FROM r WHERE rn <= 3
""",
    tags=("window", "rank"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (the reference's top-M prune
    pattern, src/hnsw.zig:143-170, applied relationally) + a rank()
    over a second ordering."""
    o = load(spark, sf_dir, "orders")
    w_price = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    w_prio = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.withColumn("rn", F.row_number().over(w_price))
        .withColumn("prio_rank", F.rank().over(w_prio))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "prio_rank")
    )


@register(
    "q_window_lag",
    oracle=f"""
WITH {EVENTS_CTE},
l AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM ev
)
SELECT user_id, event_id, event_type, delta_us, coalesce(prev_type, 'NONE') AS prev_type
FROM l
""",
    tags=("window", "lag"),
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event time delta via lag(): the sessionization
    primitive. Deltas in exact integer microseconds (engine-neutral)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        (us - F.lag(us).over(w)).alias("delta_us"),
        F.coalesce(F.lag("event_type").over(w), F.lit("NONE")).alias("prev_type"),
    )


@register(
    "q_window_frame",
    oracle="""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT) AS day_num,
         strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY 1, 2
)
SELECT day, revenue,
       round(CAST(sum(CAST(revenue AS DECIMAL(18,4))) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
       CAST(sum(CAST(revenue AS DECIMAL(18,4))) OVER (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
FROM daily
""",
    tags=("window", "frame"),
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue (RANGE frame over a
    day-number key — true calendar window, robust to missing days)
    plus a running total (ROWS frame)."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("day_num"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("revenue"))
    )
    # SCALE PIN: these windows are UNPARTITIONED by necessity (a global
    # time series has a total order), which is safe ONLY because they
    # run over `daily` — the day-level AGGREGATE, bounded by the
    # calendar (#days, invariant to data scale), never over `orders`.
    # A refactor that moved the window below the groupBy would be a
    # silent scale-killer; tests/test_plan_quality.py::
    # test_window_frame_runs_on_aggregate pins the WindowExec input.
    w_range = W.orderBy("day_num").rangeBetween(-6, 0)
    w_rows = W.orderBy("day_num").rowsBetween(W.unboundedPreceding, 0)
    rev_dec = F.col("revenue").cast("decimal(18,4)")
    return daily.select(
        "day",
        "revenue",
        F.round(
            F.sum(rev_dec).over(w_range).cast("double")
            / F.count("*").over(w_range),
            4,
        ).alias("ma7"),
        F.sum(rev_dec).over(w_rows).cast("double").alias("cum_revenue"),
    )


GAPFILL_ORACLE = f"""
WITH {EVENTS_CTE},
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         count(*) AS n, sum(CAST(value AS DECIMAL(18,4))) AS v
  FROM ev GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
  FROM bounds
),
j AS (
  SELECT s.user_id, s.hr, h.n, h.v,
         last_value(h.v IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
  FROM spine s LEFT JOIN hourly h USING (user_id, hr)
)
SELECT user_id,
       count(*) AS n_hours,
       count(n) AS n_active,
       count(*) - count(n) AS n_gaps,
       CAST(sum(v_ff) AS DOUBLE) AS ffill_total,
       CAST(sum(coalesce(v, 0)) AS DOUBLE) AS observed_total
FROM j GROUP BY user_id
"""


@register(
    "q_events_gapfill",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_curation_queries.py against GAPFILL_ORACLE
    tags=("window", "timeseries"),
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: bucket each user's events into
    an hourly grid, generate the dense hour spine between their first
    and last active hour (``sequence`` + explode — no driver-side
    calendar loop), left-join observations onto the spine, and
    forward-fill the hourly value with ``last(v, ignorenulls)`` over a
    per-user ordered window. The per-user rollup proves the fill:
    ``ffill_total`` sums the carried value across gap hours, which no
    observation-only aggregate can reproduce. All sums are
    DECIMAL-exact (summation-order-independent), cast to double only
    at the end.

    Scale: the hourly aggregation is one (user, hour) shuffle with
    map-side partials; the spine explode is bounded by each user's
    active span (one row per user-hour, never a global calendar); the
    fill window is partitioned by user — parallelism = #users, no
    single-partition window. The reference has no time or event
    surface at all (vectors only, src/hnsw.zig:12-16)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hr"),
        F.col("value").cast("decimal(18,4)").alias("value"),
    )
    hourly = ev.groupBy("user_id", "hr").agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hr"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    j = spine.join(hourly, ["user_id", "hr"], "left").select(
        "user_id", "hr", "n", "v",
        F.last("v", ignorenulls=True).over(w).alias("v_ff"),
    )
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_hours"),
        F.count("n").alias("n_active"),
        (F.count("*") - F.count("n")).alias("n_gaps"),
        F.sum("v_ff").cast("double").alias("ffill_total"),
        F.sum(F.coalesce(F.col("v"), F.lit(0))).cast("double")
        .alias("observed_total"),
    )
