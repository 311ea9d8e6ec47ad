"""Streaming declared queries: tumbling / sliding / session windows.

Each streaming construct appears twice:

- a *batch twin* (q_stream_tumbling / q_stream_sliding /
  q_stream_session) computing the identical answer with batch
  operators — fully DuckDB-oracle-checkable;
- a *streaming demo* (q_stream_demo_*) that actually executes a
  Structured Streaming query (file source, watermark, window /
  session_window, availableNow trigger, memory sink) — rows-only
  check, since a micro-batch execution trace is not SQL.

Session rule (both twins, both engines): a new session starts when
the gap to the previous event of the same user exceeds 30 minutes
(strictly greater). Window starts are epoch-aligned, matching Spark's
``window()`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.joins import EVENTS_CTE
from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load

SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "q_stream_tumbling",
    oracle=f"""
WITH {EVENTS_CTE}
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM ev
GROUP BY 1, 2
""",
    tags=("streaming", "tumbling"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — batch twin using the
    streaming-native window() function (epoch-aligned)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
WITH {EVENTS_CTE},
slid AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - (k * INTERVAL 15 MINUTE) AS win_start,
         value
  FROM ev CROSS JOIN (SELECT unnest(range(4)) AS k)
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM slid
GROUP BY 1
""",
    tags=("streaming", "sliding"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 15-minute slide (each event in
    exactly 4 windows). Oracle expands the 4 windows per event
    explicitly; Spark uses the native sliding window() operator."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_session",
    oracle=f"""
WITH {EVENTS_CTE},
d AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
  FROM ev
),
flagged AS (
  SELECT *, CASE WHEN delta_us IS NULL OR delta_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM d
),
sess AS (
  SELECT *, sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, session_id
""",
    tags=("streaming", "session"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization, batch twin via gaps-and-islands
    (lag -> new-session flag -> running sum -> group). The streaming
    mirror (native session_window + watermark) is
    q_stream_demo_session."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    d = ev.withColumn("delta_us", us - F.lag(us).over(w))
    flagged = d.withColumn(
        "is_new",
        F.when(
            F.col("delta_us").isNull() | (F.col("delta_us") > SESSION_GAP_US), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@register("q_stream_demo_tumbling", oracle=None, tags=("streaming", "demo"))
def q_stream_demo_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming execution of the tumbling twin
    (readStream -> watermark -> window agg -> memory sink). Rows-only
    check: micro-batch execution is not SQL-expressible."""
    from zvdb_spark.streaming.jobs import run_streaming_tumbling_demo

    return run_streaming_tumbling_demo(spark, sf_dir)


@register("q_stream_demo_session", oracle=None, tags=("streaming", "demo"))
def q_stream_demo_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming execution of native session_window
    with watermark. Rows-only check."""
    from zvdb_spark.streaming.jobs import run_streaming_session_demo

    return run_streaming_session_demo(spark, sf_dir)


@register("q_stream_demo_stream_join", oracle=None, tags=("streaming", "demo"))
def q_stream_demo_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (view -> purchase
    attribution within 30 minutes): both sides watermarked so join
    state is evictable, time-range condition bounds the buffer,
    append-mode sink. Rows-only check: micro-batch join-state
    execution is not SQL-expressible; the summary is compared exactly
    against its batch twin in tests/test_streaming_state.py."""
    from zvdb_spark.streaming.jobs import run_stream_stream_join_demo

    return run_stream_stream_join_demo(spark, sf_dir)


@register("q_stream_demo_foreachbatch", oracle=None, tags=("streaming", "demo"))
def q_stream_demo_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental ingest — the streaming mirror of the
    reference's insert path (src/hnsw.zig:73-117): each micro-batch is
    appended to a durable aggregate state, exactly how a vector/index
    table would absorb a stream. Rows-only check."""
    from zvdb_spark.streaming.jobs import run_foreachbatch_ingest_demo

    return run_foreachbatch_ingest_demo(spark, sf_dir)


@register("q_stream_demo_index_ingest", oracle=None, tags=("streaming", "demo"))
def q_stream_demo_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental INDEX ingest: embedding micro-batches
    build then append into a live GraphIndex (the reference's
    incremental insert, src/hnsw.zig:73-117, under Structured
    Streaming), with the row-conservation invariant of the Concurrent
    Access test (src/test_hnsw.zig:154-209) asserted before the final
    index is searched. Rows-only check."""
    from zvdb_spark.streaming.jobs import run_streaming_index_ingest_demo

    return run_streaming_index_ingest_demo(spark, sf_dir)


@register("q_stream_demo_stateful_dedup", oracle=None, tags=("streaming", "demo"))
def q_stream_demo_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    exact dedup with first-seen-wins keyed state and a processing-time
    state TTL (the dedup horizon), exercised across micro-batches by a
    duplicate-echo landing file. The streaming twin of q_doc_dedup.
    Rows-only check: state-store execution is not SQL-expressible."""
    from zvdb_spark.streaming.jobs import run_stateful_dedup_demo

    return run_stateful_dedup_demo(spark, sf_dir)


@register("q_stream_demo_pq_ingest", oracle=None, tags=("streaming", "demo", "pq"))
def q_stream_demo_pq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PQ-code ingest demo (streaming/jobs.py:
    run_pq_ingest_demo): frozen codebooks, per-micro-batch encode,
    row-conservation + code-determinism assertions inside."""
    from zvdb_spark.streaming.jobs import run_pq_ingest_demo

    return run_pq_ingest_demo(spark, sf_dir)


@register(
    "q_stream_demo_shard_export",
    oracle=None,
    tags=("streaming", "demo", "export", "pipeline"),
)
def q_stream_demo_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming shard export (streaming/jobs.py:
    run_shard_export_stream_demo): document micro-batches append into
    a standing shard layout through a commit log
    (queries/export.py:append_shards_tx) — the FileStreamSink/
    lakehouse transaction pattern on the engine's own export artifact.
    Replay no-op, crash-orphan invisibility + vacuum, and gapless
    committed pos are asserted inside; returns the committed per-shard
    manifest. Rows-only check: micro-batch execution is not
    SQL-expressible."""
    from zvdb_spark.streaming.jobs import run_shard_export_stream_demo

    return run_shard_export_stream_demo(spark, sf_dir)


@register(
    "q_stream_demo_cdc_upsert",
    oracle=None,
    tags=("streaming", "demo", "export", "delete", "pipeline"),
)
def q_stream_demo_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CHANGE FEED over the shard layout (streaming/jobs.py:
    run_cdc_upsert_stream_demo): each micro-batch's 'del' ops become
    a tombstone commit and its 'add' ops an append commit, both
    fenced under the batch_id (disjoint label namespaces), both
    halves of a redelivered batch no-ops. Last-writer-wins upsert
    semantics asserted inside (tombstones are seq-scoped): a re-add
    of a tombstoned id under a later commit is visible immediately,
    a compaction does not change the committed view, the final view
    = base - dels + adds exactly, and (shard, pos) stays unique.
    Returns the committed per-shard manifest. Rows-only check:
    micro-batch execution is not SQL-expressible."""
    from zvdb_spark.streaming.jobs import run_cdc_upsert_stream_demo

    return run_cdc_upsert_stream_demo(spark, sf_dir)
