#!/usr/bin/env python
"""Endurance replay harness — long-replay evidence for the bounded
bookkeeping + auto-retention design (BENCH/BASELINE.md "Round-5
endurance replay" section).

Replays a deterministic changelog through the mor engine with
threshold compaction AND auto-expiry inside the timed window, then
checks the final state against an INDEPENDENT LWW formulation
(``row_number`` over ``(commit desc, offset desc)``, deletes dropped —
a window plan, not the engine's max_by aggregation path) and asserts
the round-5 metadata bounds:

- 0 rows differ from the independent LWW in either direction;
- snapshot docs on disk <= keep_last + expire_every + pipeline depth;
- the final snapshot's bookkeeping is O(1): contiguous watermark =
  last batch id, empty residual, empty schema-ops list.

Prints ONE JSON line. Usage:
    python BENCH/run_endurance.py [--events 10000000] [--batches 40]
        [--expire-every 10] [--keep-last 5] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--expire-every", type=int, default=10)
    ap.add_argument("--keep-last", type=int, default=5)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--warm-events", type=int, default=150_000,
                    help="untimed JIT warm-up replay size (0 disables)")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_spark.cdc.changelog import generate_changelog
    from etl_spark.cdc.replay import ReplayEngine

    work = tempfile.mkdtemp(prefix="endurance_")
    spark = build_session(
        "endurance", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    try:
        log_path = os.path.join(work, "changelog")
        generate_changelog(
            spark, args.events, seed=42, n_repos=200, paths_per_repo=500,
            hot_share=0.3, num_batches=args.batches,
        ).write.mode("overwrite").parquet(log_path)
        log = spark.read.parquet(log_path)

        if args.warm_events:
            warm_root = os.path.join(work, "warm")
            warm_eng = ReplayEngine(spark, os.path.join(warm_root, "t"),
                                    num_buckets=args.buckets, mode="mor")
            warm_eng.replay(generate_changelog(
                spark, args.warm_events, seed=7, n_repos=50,
                paths_per_repo=100, num_batches=2,
            ))
            shutil.rmtree(warm_root, ignore_errors=True)

        table_root = os.path.join(work, "table")
        eng = ReplayEngine(
            spark, table_root, num_buckets=args.buckets, mode="mor",
            compact_threshold=8,
            expire_every=args.expire_every, expire_keep_last=args.keep_last,
        )
        t0 = time.monotonic()
        results = eng.replay(log, pipeline_depth=args.depth)
        wall = time.monotonic() - t0
        assert len(results) == args.batches and not any(r["skipped"] for r in results)

        snap = eng.table.current_snapshot()
        props = snap.properties
        snap_dir = os.path.join(table_root, "_snapshots")
        snap_docs = [f for f in os.listdir(snap_dir) if f.startswith("snapshot-")]
        doc_bytes = os.path.getsize(
            os.path.join(snap_dir, f"snapshot-{snap.version:08d}.json")
        )

        w = Window.partitionBy("repo", "path").orderBy(F.desc("commit"), F.desc("offset"))
        expected = (
            log.withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("op") != "D"))
            .select("repo", "path", "commit", "lang", "content")
        )
        state = eng.read_state().select("repo", "path", "commit", "lang", "content")
        mismatch = expected.exceptAll(state).count() + state.exceptAll(expected).count()

        bound = args.keep_last + args.expire_every + args.depth
        out = {
            "events": args.events,
            "batches": args.batches,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(args.events / wall, 1),
            "final_rows": state.count(),
            "state_mismatch_rows": mismatch,
            "snapshot_docs_on_disk": len(snap_docs),
            "snapshot_bound": bound,
            "latest_snapshot_doc_bytes": doc_bytes,
            "applied_batches_watermark": props.get("applied_batches_watermark"),
            "applied_batches_residual_len": len(props.get("applied_batches", [])),
            "applied_schema_ops_len": len(props.get("applied_schema_ops", [])),
            "per_batch_ms_first4": [r["duration_ms"] for r in results[:4]],
            "per_batch_ms_last4": [r["duration_ms"] for r in results[-4:]],
        }
        print(json.dumps(out))
        ok = (
            mismatch == 0
            and len(snap_docs) <= bound
            and int(props.get("applied_batches_watermark", -1)) == args.batches - 1
            and not props.get("applied_batches")
            and not props.get("applied_schema_ops")
        )
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
