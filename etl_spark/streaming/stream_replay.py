"""Streaming CDC ingest: ``readStream`` over the changelog directory,
``foreachBatch`` into the same fenced merge engine the batch replay uses.

This is the live-tail shape of the engine (SURVEY.md §7 design stance:
batch replay for deterministic verification, Structured Streaming for
production tailing — both funnel into ``ReplayEngine.apply_batch``, so
the exactly-once story is ONE mechanism):

- Source: file stream over the WAL directory (swap for Kafka in
  production — the sink side is source-agnostic).
- Exactly-once: Structured Streaming's epoch checkpoint gives at-least-
  once redelivery on failure; the engine's offset fence + applied-batch
  set in the table snapshot makes redelivery a no-op, upgrading the
  pipeline to exactly-once END TO END (sink-side idempotence, the same
  argument Delta/Iceberg streaming sinks make).
- ``Trigger.AvailableNow`` drains the backlog then stops — deterministic
  for tests; drop the trigger for continuous tailing.

Reference analog: the 24h sliding change-feed pull
(``src/jobs/sd_delta.py:31-32``) — re-expressed as a real stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.cdc.replay import ReplayEngine
from etl_spark.schema import CHANGE_LOG_SCHEMA


def stream_replay(
    spark: SparkSession,
    changelog_dir: str,
    table_root: str,
    checkpoint_dir: str,
    num_buckets: int = 16,
    schema_ops: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
    mode: str = "cow",
    compact_threshold: int = 8,
    lww_strategy: str = "broadcast",
    tombstone_commit_watermark: str | None = None,
    compact_delta_fraction: float | None = None,
    compact_sort: bool = True,
    expire_every: int | None = None,
    expire_keep_last: int = 5,
) -> ReplayEngine:
    """Tail ``changelog_dir`` (parquet WAL files) into the lake table.
    Blocks until the available backlog is drained; returns the engine for
    state/metrics inspection.

    ``expire_every`` / ``expire_keep_last``: auto-retention (see
    ``ReplayEngine``) — the knob MATTERS here: an unbounded stream is
    exactly the one-snapshot-per-micro-batch accumulation case. Safe in
    this loop because ``foreachBatch`` applies logical batches
    sequentially via ``apply_batch`` (every commit point is
    pipeline-drained by construction)."""
    engine = ReplayEngine(
        spark, table_root, num_buckets=num_buckets, mode=mode,
        compact_threshold=compact_threshold, lww_strategy=lww_strategy,
        tombstone_commit_watermark=tombstone_commit_watermark,
        compact_delta_fraction=compact_delta_fraction,
        compact_sort=compact_sort,
        expire_every=expire_every, expire_keep_last=expire_keep_last,
    )

    reader = spark.readStream.schema(CHANGE_LOG_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)

    def _apply(micro_batch: DataFrame, epoch_id: int) -> None:
        # a micro-batch may span several logical WAL batches; apply them
        # in batch-id order so the fence only ever moves forward
        ids = [
            r[0]
            for r in micro_batch.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        for b in ids:
            engine.apply_batch(micro_batch.filter(F.col("batch_id") == b), int(b), schema_ops)

    (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return engine
