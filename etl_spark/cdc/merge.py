"""CDC MERGE: apply one LWW-resolved micro-batch to the lake table.

Algorithm (set-based, union + one window — no join needed because the
existing rows carry their own (commit, _ingest_offset) order):

1. bucket-prune: read ONLY the buckets the batch touches (copy-on-write),
2. union existing rows (tagged with their stored order) with the batch's
   events (I/U rows carry content; D rows are tombstones),
3. one LWW window over the union picks the globally-latest version per
   key — a late-arriving event older than the stored row loses, exactly
   as ``MERGE ... WHEN MATCHED AND s.order > t.order`` would decide,
4. winners that are tombstones stay as ``_deleted`` rows (reads filter
   them; their order must outlive the commit so out-of-order stragglers
   can't resurrect a deleted key — conditional delete semantics are the
   delete_guard, reference analog ``src/sd_delta.py:57-72``),
5. rewrite the touched buckets + commit atomically with the fence
   properties (exactly-once; reference analog: skip-if-already-applied,
   ``src/byggesager/byggesager.py:191-197``).

The union+window plan shuffles once on the key hash — the same hash the
bucket layout uses, so at scale the exchange is aligned with the data
being rewritten. Hot-repo skew is handled three ways: the agg kernels'
map-side partial aggregation collapses a hot key per input partition
before the shuffle, ``lww_strategy='salted'`` pre-splits each key into
``SALT_PARTITIONS`` explicit partial groups (for payloads too wide for
map-side combine to absorb), and AQE skew-join splitting is enabled
session-wide (``etl_spark.session``).
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.cdc.lww import lww_winners, lww_winners_broadcast
from etl_spark.functions.normalize import with_content_sha256
from etl_spark.table.manifest import ManifestTable, Snapshot, bucket_expr

# lineage columns stored on every row (per-row lineage per north_rule)
LINEAGE_COLS = ["_ingest_offset", "_ingest_batch"]

# Above this many distinct keys in a batch, the broadcast LWW strategy
# automatically degrades to the hash aggregation instead of OOMing the
# driver: the winner-offset broadcast is ~8 B/key plus hashed-relation
# overhead, so 20M keys ~ hundreds of MB — near the default 8g driver's
# comfortable limit. Tunable per merge_batch call.
BROADCAST_KEY_BUDGET = 20_000_000

# lww_strategy='salted': explicit two-stage pre-split — each key is
# fanned into this many (key, salt) partial groups before the final
# per-key combine. For workloads whose payload rows are too wide for
# map-side combine to absorb a hot key (Spark spills the agg buffer and
# the hot key's rows all cross the shuffle anyway); 16 caps any single
# reducer at ~1/16 of the hottest key.
SALT_PARTITIONS = 16


def resolve_state(
    raw: DataFrame,
    lww_strategy: str = "agg",
    key_columns: list[str] | None = None,
    keep_tombstones: bool = False,
) -> DataFrame:
    """Merge-on-read resolution: one LWW winner per key over base+delta
    rows, tombstones dropped (``keep_tombstones=True`` keeps the winning
    tombstone rows — the compaction path, which must preserve delete
    ORDER so an out-of-order event arriving after compaction still loses
    to the delete). Identical rule to the cow merge, so both modes
    replay a log to the exact same final state.

    Default strategy is the hash aggregation, NOT broadcast, because the
    read/compaction winner set equals the table's total live keys — it
    grows without bound as the table grows (unlike the per-batch merge
    broadcast) and would blow the driver budget at 10^10-event scale.
    max_by is also robust to byte-identical duplicate rows (a double-read
    WAL file appended twice under mor): it picks exactly one row per key
    even on order ties, where a broadcast equality join would return both."""
    if lww_strategy == "broadcast":
        resolved = lww_winners_broadcast(
            raw, key_columns=key_columns,
            order_columns=["commit", "_ingest_offset"],
        )
    else:
        # 'salted' actually forwards the salt (it used to silently run
        # the unsalted aggregation); winners are identical either way —
        # the salt only pre-splits hot keys before the shuffle
        resolved = lww_winners(
            raw, key_columns=key_columns,
            order_columns=["commit", "_ingest_offset"],
            salt=SALT_PARTITIONS if lww_strategy == "salted" else None,
        )
    if keep_tombstones:
        return resolved
    return resolved.filter(~F.col("_deleted"))


# --------------------------------------------------------------- plan pieces
def _demote_guarded(batch_events: DataFrame, keys: list[str], delete_guard: DataFrame) -> DataFrame:
    """Reference C3 conditional delete (``src/sd_delta.py:57-72``): a D
    event on a guarded key is demoted to a no-op pre-LWW (broadcast: the
    guard is a key list, always small relative to the batch)."""
    guard = F.broadcast(
        delete_guard.select(*keys).dropDuplicates().withColumn("__guarded", F.lit(True))
    )
    return (
        batch_events.join(guard, on=keys, how="left")
        .filter(~((F.col("op") == "D") & F.col("__guarded").isNotNull()))
        .drop("__guarded")
    )


def _thin_maxes(batch_events: DataFrame, keys: list[str]) -> DataFrame:
    """THIN winner aggregate: keys + max (commit, offset, op) + event
    count. Parquet never reads content for it; `op` rides INSIDE the
    order struct (it can never flip the max: offset is unique per key),
    so this one tiny aggregate yields the winner offsets AND every
    stats/lineage counter."""
    order_op = F.struct(F.col("commit"), F.col("offset"), F.col("op")).alias("__ord")
    return (
        batch_events.select(*keys, order_op)
        .groupBy(*keys)
        .agg(F.max("__ord").alias("__ord"), F.count(F.lit(1)).alias("__n"))
    )


def _bucket_rollup(maxes: DataFrame, keys: list[str], num_buckets: int) -> DataFrame:
    """Per-bucket (= per key-partition) lineage from the thin aggregate:
    one row per bucket with key/event/delete counts (north_rule:
    per-partition lineage + ingest metrics)."""
    return maxes.groupBy(bucket_expr(keys, num_buckets).alias("bucket")).agg(
        F.count(F.lit(1)).alias("keys"),
        F.sum("__n").alias("events"),
        F.sum((F.col("__ord.op") == "D").cast("long")).alias("deletes"),
    )


def _schema_projection(winners: DataFrame, snap: Snapshot, batch_id: int) -> DataFrame:
    """Project winner events to the current table schema. Rename-aware: a
    column renamed on the table (e.g. lang -> language) still arrives
    from the wire under its original name, so we resolve by column id
    back to the v1 (wire) name. Added columns the events don't carry get
    their schema default; widened types are cast up."""
    # wire name resolution: the wire always uses a column's ORIGINAL
    # name — its v1 name for original columns, its ADD-TIME name for
    # columns added by later schema versions (resolving through v1
    # alone made every post-v1 added column invisible here, silently
    # replacing event-carried values with the column default — a
    # divergent replica under chain propagation)
    wire_names: dict[int, str] = {}
    for v in sorted(snap.schemas):
        for sc in snap.schemas[v].columns:
            wire_names.setdefault(sc.id, sc.name)
    event_cols = set(winners.columns)
    computed = {"content_sha256", "_ingest_offset", "_ingest_batch", "_deleted"}
    proj = []
    for c in snap.schema.columns:
        if c.name in computed:
            continue
        wire = wire_names.get(c.id)
        if wire in event_cols:
            proj.append(F.col(wire).cast(c.type).alias(c.name))
        else:
            proj.append(F.lit(c.default).cast(c.type).alias(c.name))
    return winners.select(
        *proj,
        F.col("op").alias("__op"),
        F.col("offset").alias("_ingest_offset"),
        F.lit(batch_id).cast("int").alias("_ingest_batch"),
    )


def plan_mor_batch(
    snap: Snapshot,
    keys: list[str],
    batch_events: DataFrame,
    batch_id: int,
    lww_strategy: str = "broadcast",
    broadcast_key_budget: int = BROADCAST_KEY_BUDGET,
    events_upper_bound: int | None = None,
    delete_guard: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, str]:
    """Pure plan construction for one merge-on-read batch — NO Spark jobs
    run here. Returns ``(delta_plan, per_bucket_stats_plan, lww_path)``:
    the delta frame ready for ``write_delta_files`` (winners as rows,
    deletes as ``_deleted`` tombstones) and the independent thin
    stats/lineage rollup the caller collects concurrently.

    Winner kernel choice needs no gating job: distinct keys <= events,
    so ``events_upper_bound`` (known arithmetically from the batch's
    offset range) under the broadcast budget proves the winner-offset
    broadcast is safe; over budget or unknown, the fused map-side-
    combined hash aggregation resolves winners with no key count at all
    — its exchange doubles as the bucket write exchange when
    shuffle.partitions == num_buckets."""
    if delete_guard is not None:
        batch_events = _demote_guarded(batch_events, keys, delete_guard)
    maxes_plan = _thin_maxes(batch_events, keys)
    per_bucket_plan = _bucket_rollup(maxes_plan, keys, snap.num_buckets)

    broadcast_safe = (
        lww_strategy == "broadcast"
        and events_upper_bound is not None
        and events_upper_bound <= broadcast_key_budget
    )
    salt = SALT_PARTITIONS if lww_strategy == "salted" else None
    if broadcast_safe:
        # the winning OFFSET alone identifies the winning event (WAL
        # offsets are globally unique; the fence keeps re-deliveries out
        # of the batch; a malformed double-delivered batch would append
        # duplicate winners — harmless, because resolve_state's max_by
        # collapses exact duplicates on read), so the broadcast is one
        # long per key — ~8 B/row, a LongHashedRelation built inside the
        # write job's own broadcast stage (no separate gating job)
        lww_path = "broadcast-async"
        winner_offsets = maxes_plan.select(F.col("__ord.offset").alias("__w_offset"))
        winners = batch_events.join(
            F.broadcast(winner_offsets), on=F.col("offset") == F.col("__w_offset")
        ).select(*batch_events.columns)
    else:
        # FUSED hash-agg kernel: max_by over full rows — map-side
        # combined, so a hot repo collapses before the shuffle — feeds
        # the bucket write directly; safe at any batch size. 'salted'
        # adds an explicit (key, salt) pre-combine stage for payloads
        # too wide for map-side combine to absorb.
        if lww_strategy == "salted":
            lww_path = "agg-salted"
        else:
            lww_path = "agg-fused" if lww_strategy != "broadcast" else "agg-fallback"
        winners = lww_winners(batch_events, key_columns=keys, salt=salt)

    source = _schema_projection(winners, snap, batch_id)
    delta = source.withColumn("_deleted", F.col("__op") == "D").drop("__op")
    return delta, per_bucket_plan, lww_path


def _stats_from_rows(per_bucket: list) -> dict:
    stats = {
        "keys": sum(r["keys"] for r in per_bucket),
        "events": sum(r["events"] for r in per_bucket),
        "dels": sum(r["deletes"] for r in per_bucket),
    }
    stats["ups"] = stats["keys"] - stats["dels"]
    stats["buckets"] = [r["bucket"] for r in per_bucket]
    return stats


def _bucket_counters(per_bucket: list) -> list[dict]:
    return [
        {"bucket": int(r["bucket"]), "keys": int(r["keys"]),
         "events": int(r["events"]), "deletes": int(r["deletes"])}
        for r in per_bucket
    ]


def merge_batch(
    table: ManifestTable,
    batch_events: DataFrame,
    batch_id: int,
    properties_update: dict,
    mode: str = "cow",
    lww_strategy: str = "broadcast",
    delete_guard: DataFrame | None = None,
    broadcast_key_budget: int = BROADCAST_KEY_BUDGET,
    events_upper_bound: int | None = None,
    tombstone_commit_watermark: str | None = None,
) -> tuple[Snapshot, dict]:
    """Apply one micro-batch of change events. Returns (snapshot, counters).

    ``batch_events``: CHANGE_LOG_SCHEMA rows (may contain multiple events
    per key, out-of-order commits — the LWW window resolves them here).

    ``mode``:
    - ``cow`` (copy-on-write): read + rewrite the touched buckets; reads
      stay resolution-free. Right when batches touch few buckets.
    - ``mor`` (merge-on-read): append the batch's LWW winners (deletes as
      ``_deleted`` tombstones) as delta files — O(batch) write cost even
      when a hot repo touches every bucket; readers resolve via the same
      LWW rule (see ``resolve_state``), compaction folds deltas back
      down. The 10^10-events/hot-skew scale path.

    ``delete_guard``: optional DataFrame of key columns naming rows that
    must NOT be deleted this batch (reference C3 conditional delete —
    ``src/sd_delta.py:57-72`` deletes an employment only if the person
    is confirmed gone AND nothing depends on it). A guarded D event is
    demoted to a no-op: the key's stored row survives untouched.

    ``events_upper_bound``: a cheap upper bound on this batch's event
    count (the replay loop knows it arithmetically from the batch's
    offset range — no job). Under mor it replaces the gating stats job
    for the broadcast-budget decision: distinct keys <= events, so a
    bound under the budget proves the winner broadcast is safe and the
    per-bucket stats/lineage aggregation moves OFF the critical path
    onto a concurrent thread (the stats pre-job measured ~1 s of SERIAL
    per-batch cost at 8 cores — the dominant term in N->4N scaling
    efficiency). Without a bound (None), mor conservatively uses the
    fused hash-agg kernel, which needs no key count at all.

    ``tombstone_commit_watermark``: the ingest's disorder bound (no
    future event may carry a commit strictly below it). Under cow it
    ages out stored tombstones during the bucket rewrite that is
    happening anyway — cow buckets never accumulate delta files, so
    compaction's watermark path is unreachable for them and this is
    the only place cow tombstone storage gets bounded. Under mor the
    same watermark is applied by ``ReplayEngine.compact``.
    """
    t_start = time.monotonic()
    snap = table.current_snapshot()
    keys = table.key_columns

    if mode == "mor":
        # Stats/lineage move OFF the critical path: an independent tiny
        # job on a second thread overlaps the write instead of gating
        # it. Nothing in the mor write needs the stats: the bucket set
        # falls out of the append itself, and the broadcast-budget
        # decision uses events_upper_bound (keys <= events).
        t_snap = time.monotonic()
        delta, per_bucket_plan, lww_path = plan_mor_batch(
            snap, keys, batch_events, batch_id,
            lww_strategy=lww_strategy,
            broadcast_key_budget=broadcast_key_budget,
            events_upper_bound=events_upper_bound,
            delete_guard=delete_guard,
        )
        stats_holder: dict = {}

        def _collect_stats() -> None:
            try:
                stats_holder["rows"] = per_bucket_plan.collect()
            except BaseException as e:  # re-raised on join below
                stats_holder["err"] = e

        # write winners as deltas (deletes ride along as tombstones);
        # nothing is read, nothing is rewritten — one bucket-aligned
        # shuffle + write per batch. The normalize+sha256 pandas_udf runs
        # as the writer's post_shuffle hook: AFTER the bucket exchange,
        # at full write parallelism. Write and commit are split so the
        # stats job is consumed BEFORE the commit: a stats failure after
        # the commit would leave the batch durably applied with its
        # metrics/lineage rows permanently missing (resume skips applied
        # batches) — failing before the commit makes resume recompute.
        #
        # fused path: make the winners agg's exchange BE the bucket
        # exchange — with shuffle.partitions == num_buckets the explicit
        # repartition in the writer is redundant and eliminated, so
        # content is shuffled once. Session conf is per-session shared
        # state, so the override brackets the ENTIRE batch — set before
        # the stats thread starts, restored only after it joins — making
        # every plan built inside the batch (write AND concurrent stats)
        # see one constant value instead of racing a mid-batch restore.
        # Cross-session exposure is the documented single-logical-writer
        # assumption; pass the engine a dedicated spark.newSession() to
        # isolate it from other workloads sharing the context.
        sess = batch_events.sparkSession
        old_sp = sess.conf.get("spark.sql.shuffle.partitions")
        sess.conf.set("spark.sql.shuffle.partitions", str(snap.num_buckets))
        stats_thread = threading.Thread(target=_collect_stats, daemon=True)
        stats_started = False
        try:
            # start() inside the bracket's try: if it raises (thread
            # exhaustion), the finally must still restore the conf —
            # start() sits after the conf override, so leaving it outside
            # would pin shuffle.partitions for the session lifetime.
            stats_thread.start()
            stats_started = True
            t_planned = time.monotonic()
            written = table.write_delta_files(
                delta, snap, post_shuffle=with_content_sha256
            )
            t_written = time.monotonic()
        finally:
            # join BEFORE restoring the conf, on every exit path: if the
            # write raises, the stats thread may still be building plans —
            # restoring mid-flight is exactly the mid-batch-restore race
            # the whole-batch bracket exists to eliminate (and a live
            # thread would leak into the next batch on engines that catch
            # and continue). The stats job is a bounded metadata collect,
            # so an untimed join is safe. (join() on a never-started
            # thread raises, hence the flag.)
            if stats_started:
                stats_thread.join()
            sess.conf.set("spark.sql.shuffle.partitions", old_sp)
        if "err" in stats_holder:
            raise stats_holder["err"]
        per_bucket = stats_holder["rows"]
        stats = _stats_from_rows(per_bucket)
        t_joined = time.monotonic()
        new_snap = table.commit_appended(
            written, snap.current_schema_version, properties_update
        )
        t_committed = time.monotonic()
        counters = {
            "rows_in": stats["events"], "distinct_keys": stats["keys"],
            "upserts": stats["ups"], "deletes": stats["dels"],
            "lww_path": lww_path,
            # phase breakdown for serial-overhead profiling: "snapshot" =
            # manifest read, "plan" = driver-side frame construction,
            # "write" = winner resolve + bucket exchange + UDF + parquet,
            # "stats_wait" = residual wait on the concurrent stats job,
            # "commit" = atomic snapshot publish
            "timings_ms": {
                "snapshot": int((t_snap - t_start) * 1000),
                "plan": int((t_planned - t_snap) * 1000),
                "write": int((t_written - t_planned) * 1000),
                "stats_wait": int((t_joined - t_written) * 1000),
                "commit": int((t_committed - t_joined) * 1000),
            },
            "per_bucket": _bucket_counters(per_bucket),
        }
        return new_snap, counters

    # ---------------- cow: stats gate the touched-bucket read ----------------
    t_plan = time.monotonic()
    batch_events, maxes, per_bucket, stats = cow_batch_stats(
        batch_events, keys, snap.num_buckets, delete_guard=delete_guard
    )
    try:
        t_stats = time.monotonic()
        touched, survivors = cow_batch_survivors(
            table, snap, batch_events, maxes, stats, batch_id,
            lww_strategy=lww_strategy,
            broadcast_key_budget=broadcast_key_budget,
            tombstone_commit_watermark=tombstone_commit_watermark,
        )
        new_snap = table.rewrite_buckets(touched, survivors, properties_update, basis=snap)
    finally:
        # release the cached thin maxes even when the rewrite or commit
        # raises (e.g. CommitConflictError) — a long-running driver that
        # catches per-batch errors must not leak cache blocks
        maxes.unpersist()
    t_written = time.monotonic()
    counters = {
        "rows_in": stats["events"], "distinct_keys": stats["keys"],
        "upserts": stats["ups"], "deletes": stats["dels"],
        "lww_path": stats["lww_path"],
        "timings_ms": {
            "plan": int((t_plan - t_start) * 1000),
            "stats": int((t_stats - t_plan) * 1000),
            "write": int((t_written - t_stats) * 1000),
            "stats_wait": 0,
        },
        "per_bucket": _bucket_counters(per_bucket),
    }
    return new_snap, counters


def cow_batch_stats(
    batch_events: DataFrame,
    keys: list[str],
    num_buckets: int,
    delete_guard: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, list, dict]:
    """Stage 1 of the cow plan: guard demotion, thin per-key maxes
    (~60 B/distinct key), and the per-bucket rollup that names the
    TOUCHED BUCKETS. Split out so the pipelined replay loop can learn a
    batch's bucket set — and decide whether it may overlap the batches
    already in flight — before any table state is read.

    Returns (guarded_events, maxes[cached], per_bucket_rows, stats)."""
    if delete_guard is not None:
        batch_events = _demote_guarded(batch_events, keys, delete_guard)
    maxes = _thin_maxes(batch_events, keys).cache()
    per_bucket = _bucket_rollup(maxes, keys, num_buckets).collect()
    return batch_events, maxes, per_bucket, _stats_from_rows(per_bucket)


def cow_batch_survivors(
    table: ManifestTable,
    snap: Snapshot,
    batch_events: DataFrame,
    maxes: DataFrame,
    stats: dict,
    batch_id: int,
    *,
    lww_strategy: str = "broadcast",
    broadcast_key_budget: int = BROADCAST_KEY_BUDGET,
    tombstone_commit_watermark: str | None = None,
) -> tuple[list[int], DataFrame]:
    """Stage 2 of the cow plan: LWW winners, union with the touched
    buckets read from ``snap``, global resolve, tombstone aging.
    Returns (touched_buckets, survivors) — the frame
    ``rewrite_buckets`` (or ``write_rewrite_files``) consumes.
    Mutates ``stats['lww_path']``."""
    keys = table.key_columns
    if lww_strategy == "broadcast" and stats["keys"] <= broadcast_key_budget:
        stats["lww_path"] = "broadcast"
        winner_offsets = maxes.select(F.col("__ord.offset").alias("__w_offset"))
        winners = batch_events.join(
            F.broadcast(winner_offsets), on=F.col("offset") == F.col("__w_offset")
        ).select(*batch_events.columns)
    else:
        # automatic degrade (docstring promise, VERDICT r01 #5): a batch
        # with more distinct keys than the driver's broadcast budget
        # falls back to the hash-agg winner kernel instead of OOMing the
        # broadcast. The thin aggregate above still paid for
        # stats/lineage either way. Winners resolve by the TABLE's key
        # columns — a table keyed on other columns must not fall back to
        # the module default.
        if lww_strategy == "salted":
            stats["lww_path"] = "agg-salted"
        else:
            stats["lww_path"] = "agg-fallback" if lww_strategy == "broadcast" else "agg"
        winners = lww_winners(
            batch_events, key_columns=keys,
            salt=SALT_PARTITIONS if lww_strategy == "salted" else None,
        )
    touched = sorted(stats["buckets"])

    # fingerprint new rows before the union (stored rows carry theirs)
    source = with_content_sha256(_schema_projection(winners, snap, batch_id))
    existing = (
        table.read(buckets=touched, snapshot=snap)
        .withColumn("__op", F.lit(None).cast("string"))
    )
    src = source.withColumn("_deleted", F.col("__op") == "D")
    unioned = existing.unionByName(src.select(*existing.columns))
    # tiebreak __op desc_nulls_last: a redelivered identical event (same
    # commit+offset as the stored row) deterministically resolves to the
    # incoming copy — same bytes either way, but the plan stays stable
    resolved = lww_winners(
        unioned, key_columns=keys, order_columns=["commit", "_ingest_offset"], tiebreak="__op"
    )
    # Winning tombstones are KEPT as _deleted rows (reads filter them
    # out), not physically dropped: the delete's (commit, offset) order
    # must survive the commit, or an out-of-order event in a LATER batch
    # carrying an OLDER commit would resurrect the key — cow and mor
    # both match the global-log oracle under arbitrary cross-batch
    # commit disorder. Under mor, tombstones age out via compaction's
    # commit watermark (see ReplayEngine.compact); under cow that path
    # is unreachable (cow buckets hold one file, never enough deltas to
    # trigger compaction), so the watermark is applied HERE, during the
    # rewrite the batch pays for anyway — otherwise cow tables would
    # accumulate and rewrite every deleted key forever.
    survivors = resolved.drop("__op")
    if tombstone_commit_watermark is not None:
        survivors = survivors.filter(
            (~F.col("_deleted")) | (F.col("commit") >= tombstone_commit_watermark)
        )
    return touched, survivors
