"""Structured Streaming jobs — the streaming mirror of the batch
twins in queries/streaming_twins.py.

The reference's only ingest is single-point ``insert`` under a global
lock (``src/hnsw.zig:73-117``); its Spark replacement for streams is
``readStream -> transform -> writeStream`` with watermarks. These
demos actually execute a streaming query (file source over the events
parquet, availableNow trigger, memory sink) and return the sink as a
DataFrame — the driver's rows-only check observes real streaming
micro-batch execution, not a batch rewrite.

On a cluster the same code points at a directory that keeps receiving
files (or a Kafka source) with ``trigger(processingTime=...)`` and a
real sink; availableNow gives deterministic termination for tests.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns since epoch (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource requires a directory; point at sf_dir and glob
    # the single events file (on a cluster this would be the landing
    # directory receiving new files).
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


DEMO_TIMEOUT_S = 180.0


def _await_bounded(q, timeout_s: float = DEMO_TIMEOUT_S) -> None:
    """Wait for a streaming query with a hard bound, stopping it if it
    overruns — a demo must never wedge the shared session (the batch
    queries that follow it in a harness run depend on that)."""
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            q.stop()
            q.awaitTermination(30)
    finally:
        if q.isActive:
            q.stop()


def _run_to_memory(result: DataFrame, output_mode: str) -> DataFrame:
    name = f"stream_demo_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q)
    return result.sparkSession.table(name)


def run_streaming_tumbling_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts with a 1-hour watermark, executed
    as a real streaming query. Mirrors q_stream_tumbling."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


def run_streaming_session_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute gap) via session_window —
    Spark's native stateful session operator — as a real streaming
    query. Mirrors q_stream_session."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


def run_foreachbatch_ingest_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest via foreachBatch — the streaming mirror of
    the reference's ``insert`` (src/hnsw.zig:73-117): every micro-batch
    is merged into a durable per-user aggregate table (parquet),
    exactly how a vector/index table absorbs an append stream. The
    micro-batch callback is arbitrary batch code, so the same
    build_hnsw_index call could run here per batch.
    """
    import tempfile

    state_dir = tempfile.mkdtemp(prefix="zvdb_fb_state_")
    ev = _events_stream(spark, sf_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        agg.write.mode("append").parquet(state_dir)

    q = (
        ev.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q)
    # compact the per-batch partial states into the final aggregate
    state = spark.read.parquet(state_dir)
    return state.groupBy("user_id").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").cast("double").alias("sum_value"),
    )


def run_streaming_index_ingest_demo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming incremental INDEX ingest: embedding micro-batches
    stream into a live GraphIndex — the first batch bulk-builds, every
    later batch goes through ``GraphIndex.append`` (per-new-point
    connect + local re-prune, the reference's incremental ``insert``,
    src/hnsw.zig:73-117) — never a rebuild. After the stream drains,
    the row-conservation invariant of the reference's Concurrent
    Access test (src/test_hnsw.zig:154-209) is asserted and the final
    index is searched; the returned top-k frame is the rows-only
    check surface.
    """
    import tempfile

    from zvdb_spark.functions.vector import as_double_array
    from zvdb_spark.operators.graph_ann import GraphIndex
    from zvdb_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    # landing directory: several files so availableNow +
    # maxFilesPerTrigger=1 yields genuinely separate micro-batches
    land = tempfile.mkdtemp(prefix="zvdb_ingest_land_")
    emb.repartition(4).write.mode("overwrite").parquet(land)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    holder: dict[str, GraphIndex] = {}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        if "idx" not in holder:
            holder["idx"] = GraphIndex(m=8, ef=64, seed=7).build(batch)
        else:
            holder["idx"].append(batch)

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q)
    idx = holder.get("idx")
    if idx is None:
        raise ValueError(
            "stream delivered no rows to ingest — no index was built"
        )
    n_expected = emb.count()
    if idx.n_rows != n_expected:
        raise AssertionError(
            f"row conservation violated: index has {idx.n_rows} rows, "
            f"stream delivered {n_expected}"
        )
    probes = (
        emb.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
        .localCheckpoint(eager=True)
    )
    return idx.search(probes, k=5, n_queries=10)
