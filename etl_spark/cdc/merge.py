"""CDC MERGE: apply one LWW-resolved micro-batch to the lake table.

Algorithm (set-based, union + one window — no join needed because the
existing rows carry their own (commit, _ingest_offset) order):

1. bucket-prune: read ONLY the buckets the batch touches (copy-on-write),
2. union existing rows (tagged with their stored order) with the batch's
   events (I/U rows carry content; D rows are tombstones),
3. one LWW window over the union picks the globally-latest version per
   key — a late-arriving event older than the stored row loses, exactly
   as ``MERGE ... WHEN MATCHED AND s.order > t.order`` would decide,
4. drop rows whose winner is a tombstone (conditional delete,
   reference analog ``src/sd_delta.py:57-72``),
5. rewrite the touched buckets + commit atomically with the fence
   properties (exactly-once; reference analog: skip-if-already-applied,
   ``src/byggesager/byggesager.py:191-197``).

The union+window plan shuffles once on the key hash — the same hash the
bucket layout uses, so at scale the exchange is aligned with the data
being rewritten. Hot-repo skew is pre-split by salting in the replay
planner plus AQE skew handling (see ``etl_spark.cdc.replay``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.cdc.lww import lww_winners
from etl_spark.functions.normalize import with_content_sha256
from etl_spark.table.manifest import ManifestTable, Snapshot, bucket_expr

# lineage columns stored on every row (per-row lineage per north_rule)
LINEAGE_COLS = ["_ingest_offset", "_ingest_batch"]


def merge_batch(
    table: ManifestTable,
    batch_events: DataFrame,
    batch_id: int,
    properties_update: dict,
) -> tuple[Snapshot, dict]:
    """Apply one micro-batch of change events. Returns (snapshot, counters).

    ``batch_events``: CHANGE_LOG_SCHEMA rows (may contain multiple events
    per key, out-of-order commits — the LWW window resolves them here).
    """
    snap = table.current_snapshot()

    # one winner per key inside the batch (cheap: batch << table);
    # __n_events rides along so totals come from this same agg job
    winners = lww_winners(batch_events, count_col="__n_events").cache()

    # ONE small driver-side job for all counters + touched buckets
    # (winners is tiny: one row per distinct key in the batch)
    stats = winners.agg(
        F.count(F.lit(1)).alias("keys"),
        F.coalesce(F.sum("__n_events"), F.lit(0)).alias("events"),
        F.coalesce(F.sum((F.col("op") != "D").cast("long")), F.lit(0)).alias("ups"),
        F.coalesce(F.sum((F.col("op") == "D").cast("long")), F.lit(0)).alias("dels"),
        F.collect_set(bucket_expr(table.key_columns, snap.num_buckets)).alias("buckets"),
    ).first()
    n_keys, n_events = stats["keys"], stats["events"]
    touched = sorted(stats["buckets"])

    # Project events to the current table schema. Rename-aware: a column
    # renamed on the table (e.g. lang -> language) still arrives from the
    # wire under its original name, so we resolve by column id back to the
    # v1 (wire) name. Added columns the events don't carry get their
    # schema default; widened types are cast up.
    v1_names = {c.id: c.name for c in snap.schemas[1].columns}
    event_cols = set(batch_events.columns)
    computed = {"content_sha256", "_ingest_offset", "_ingest_batch"}
    proj = []
    for c in snap.schema.columns:
        if c.name in computed:
            continue
        wire = v1_names.get(c.id)
        if wire in event_cols:
            proj.append(F.col(wire).cast(c.type).alias(c.name))
        else:
            proj.append(F.lit(c.default).cast(c.type).alias(c.name))
    source = winners.select(
        *proj,
        F.col("op").alias("__op"),
        F.col("offset").alias("_ingest_offset"),
        F.lit(batch_id).cast("int").alias("_ingest_batch"),
    )
    # fingerprint only rows that survive as upserts (D rows have null content)
    source = with_content_sha256(source)

    existing = table.read(buckets=touched, snapshot=snap).withColumn("__op", F.lit(None).cast("string"))

    unioned = existing.unionByName(source.select(*existing.columns))
    # tiebreak __op desc_nulls_last: a redelivered identical event (same
    # commit+offset as the stored row) deterministically resolves to the
    # incoming copy — same bytes either way, but the plan stays stable
    resolved = lww_winners(unioned, order_columns=["commit", "_ingest_offset"], tiebreak="__op")
    survivors = resolved.filter((F.col("__op").isNull()) | (F.col("__op") != "D")).drop("__op")

    new_snap = table.rewrite_buckets(touched, survivors, properties_update)
    counters = {"rows_in": n_events, "distinct_keys": n_keys,
                "upserts": stats["ups"], "deletes": stats["dels"]}
    winners.unpersist()
    return new_snap, counters
