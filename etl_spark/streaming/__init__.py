"""Structured Streaming surface: streaming CDC ingest (foreachBatch into
the fenced merge engine) and watermarked event-time aggregation."""

from etl_spark.streaming.stream_replay import stream_replay  # noqa: F401
from etl_spark.streaming.windowed import windowed_event_counts  # noqa: F401
from etl_spark.streaming.stateful import stream_lww_state  # noqa: F401
