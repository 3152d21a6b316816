"""Batch replay loop: offsets -> evolution -> LWW -> MERGE -> fence -> metrics.

The engine replays a binlog/WAL-shaped change log as deterministic
micro-batches (Structured-Streaming-shaped semantics — offsets, fencing,
checkpoint resume — run as batch so a fixed log always replays to the
exact same final state).

Exactly-once: every snapshot commit atomically records
``applied_batches`` + ``fence_offset`` in the snapshot properties; a
re-delivered batch is a no-op (idempotent), and resume-after-crash picks
up from the first unapplied batch. Reference analogs: 24h sliding pull
window (``src/jobs/sd_delta.py:31-32``), skip-if-already-applied
idempotency (``src/byggesager/byggesager.py:191-197``,
``src/jobs/byggesager_sbsys.py:35-44``), retry/resume
(``src/sensum/sensum.py:110-112``).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.cdc.evolution import apply_evolution_op
from etl_spark.cdc.merge import merge_batch
from etl_spark.schema import INGEST_METRICS_SCHEMA
from etl_spark.table.manifest import ColumnDef, ManifestTable, TableSchema

# target table schema v1: input_hint columns + fingerprint + per-row lineage
CDC_TARGET_COLUMNS = [
    ColumnDef(1, "repo", "string"),
    ColumnDef(2, "path", "string"),
    ColumnDef(3, "commit", "string"),
    ColumnDef(4, "lang", "string"),
    ColumnDef(5, "content", "string"),
    ColumnDef(6, "content_sha256", "string"),
    ColumnDef(7, "_ingest_offset", "long"),
    ColumnDef(8, "_ingest_batch", "int"),
]


class ReplayEngine:
    def __init__(self, spark: SparkSession, table_root: str, num_buckets: int = 16):
        self.spark = spark
        self.table_root = table_root
        self.num_buckets = num_buckets
        if ManifestTable.exists(table_root):
            self.table = ManifestTable(spark, table_root, ["repo", "path"])
        else:
            self.table = ManifestTable.create(
                spark,
                table_root,
                TableSchema([ColumnDef(c.id, c.name, c.type, c.default) for c in CDC_TARGET_COLUMNS]),
                key_columns=["repo", "path"],
                num_buckets=num_buckets,
                properties={"applied_batches": [], "applied_schema_ops": [], "fence_offset": -1},
            )
        self._metrics_dir = os.path.join(table_root, "_ingest_metrics")

    # ---------- bookkeeping ----------

    def applied_batches(self) -> list[int]:
        return list(self.table.current_snapshot().properties.get("applied_batches", []))

    def fence_offset(self) -> int:
        return int(self.table.current_snapshot().properties.get("fence_offset", -1))

    def metrics(self) -> DataFrame:
        if not os.path.isdir(self._metrics_dir) or not os.listdir(self._metrics_dir):
            return self.spark.createDataFrame([], INGEST_METRICS_SCHEMA)
        return self.spark.read.parquet(self._metrics_dir)

    def read_state(self) -> DataFrame:
        return self.table.read()

    # ---------- the loop ----------

    def replay(
        self,
        changelog: DataFrame,
        schema_ops: DataFrame | None = None,
        batches: list[int] | None = None,
    ) -> list[dict]:
        """Apply all (or the given) batches in batch-id order; skip batches
        already fenced into the table. Returns per-batch counter dicts."""
        if batches is None:
            batches = [r[0] for r in changelog.select("batch_id").distinct().orderBy("batch_id").collect()]
        results = []
        for b in sorted(batches):
            results.append(self.apply_batch(changelog, b, schema_ops))
        return results

    def apply_batch(self, changelog: DataFrame, batch_id: int, schema_ops: DataFrame | None = None) -> dict:
        t0 = time.monotonic()
        snap = self.table.current_snapshot()
        applied = list(snap.properties.get("applied_batches", []))
        if batch_id in applied:
            return {"batch_id": batch_id, "skipped": True}

        batch = changelog.filter(F.col("batch_id") == batch_id)
        lo, hi = batch.select(F.min("offset"), F.max("offset")).first()
        if lo is None:  # empty batch: still fence it
            lo, hi = self.fence_offset(), self.fence_offset()

        # defensive fence: drop any event at or below the committed fence
        fence = int(snap.properties.get("fence_offset", -1))
        batch = batch.filter(F.col("offset") > fence)

        # schema evolution ops inside this batch's offset range, applied first
        n_ops = 0
        if schema_ops is not None:
            applied_ops = set(snap.properties.get("applied_schema_ops", []))
            pending = [
                r
                for r in schema_ops.filter(F.col("offset") <= hi).orderBy("offset").collect()
                if r["offset"] not in applied_ops
            ]
            for r in pending:
                apply_evolution_op(self.table, r["kind"], r["column"], r["detail"])
                applied_ops.add(r["offset"])
                n_ops += 1
            if n_ops:
                # record applied ops in the next data commit's properties
                snap = self.table.current_snapshot()
                snap_props_ops = sorted(applied_ops)
            else:
                snap_props_ops = sorted(applied_ops)
        else:
            snap_props_ops = list(snap.properties.get("applied_schema_ops", []))

        props = {
            "applied_batches": applied + [batch_id],
            "applied_schema_ops": snap_props_ops,
            "fence_offset": max(fence, int(hi)),
        }
        _, counters = merge_batch(self.table, batch, batch_id, props)

        duration_ms = int((time.monotonic() - t0) * 1000)
        row = (
            batch_id,
            counters["rows_in"],
            counters["upserts"],
            counters["deletes"],
            counters["distinct_keys"],
            n_ops,
            duration_ms,
        )
        self.spark.createDataFrame([row], INGEST_METRICS_SCHEMA).coalesce(1).write.mode("append").parquet(
            self._metrics_dir
        )
        return {"batch_id": batch_id, "skipped": False, "schema_ops": n_ops,
                "duration_ms": duration_ms, **counters}
