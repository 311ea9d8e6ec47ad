from zvdb_spark.streaming.jobs import run_streaming_session_demo, run_streaming_tumbling_demo  # noqa: F401
