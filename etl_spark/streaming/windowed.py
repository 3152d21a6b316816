"""Watermarked event-time windowed aggregation (SURVEY.md C5 analog).

The reference keeps late/future-dated events and folds them into later
pull windows (``src/sd_client.py:244-249``). The Structured Streaming
re-expression: event-time tumbling windows with a watermark — late rows
inside the watermark still update their window; rows later than the
watermark are dropped (the documented, bounded-state semantics at
100 TB stream scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    watermark. Works on both streaming and batch DataFrames (same plan;
    batch ignores the watermark) — tests exploit that equivalence."""
    # parquet timestamps surface as TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP_LTZ — cast in both modes (session TZ is UTC, values equal).
    # NULL event times carry no window: Spark's window() drops them in
    # batch mode and a watermark cannot order them in streaming — the
    # filter makes that contract explicit (and the oracle mirrors it)
    src = events.filter(F.col(ts_col).isNotNull()).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            # NTZ output: the source column is TIMESTAMP_NTZ and the
            # DuckDB oracle's time_bucket is NTZ too — emitting LTZ here
            # would make value comparison depend on the comparator's tz
            # canonicalization (session TZ is UTC, values identical)
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            F.col("win.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def windowed_event_counts_batch(spark, sf_dir: str) -> DataFrame:
    """Catalog entry: the same windowed plan run in batch mode over the
    events table (streaming/batch equivalence is the test's invariant)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(e)


WINDOWED_EVENT_COUNTS_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""
