"""Canonical schemas for the CDC engine.

Base table shape is fixed by the input hint: an Iceberg-style lake table of
source-code repositories ``(repo, path, commit, lang, content)`` keyed on
``(repo, path)``, change events totally ordered by ``(commit, offset)``.

Reference analogs (cited for parity, not ported):
- change-event envelope ~ the employment change feed
  (reference ``src/sd_client.py:211-253``): per-entity change records with a
  status code and effective ordering.
- op codes I/U/D ~ the status-code state machine
  (reference ``src/sd_delta.py:14,106-119``).
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_COLUMNS = ["repo", "path"]
ORDER_COLUMNS = ["commit", "offset"]

# The lake-table (target) schema. `content_sha256` is engine-computed.
REPO_FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)

# Binlog/WAL-shaped change event envelope.
CHANGE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),  # null for D
        T.StructField("batch_id", T.IntegerType(), False),
    ]
)

# In-flight DDL events interleaved with the change log (same offset order).
SCHEMA_EVOLUTION_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # add_column|rename_column|widen_type|drop_column
        T.StructField("column", T.StringType(), False),
        T.StructField("detail", T.StringType(), True),  # JSON payload
    ]
)

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("fenced_offset", T.LongType(), False),
        T.StructField("committed_snapshot", T.LongType(), False),
    ]
)

INGEST_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("upserts", T.LongType(), False),
        T.StructField("deletes", T.LongType(), False),
        T.StructField("distinct_keys", T.LongType(), False),
        T.StructField("schema_ops", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
    ]
)
