#!/usr/bin/env python
"""Per-batch phase profile of the CDC replay hot loop.

Prints, per batch, the merge phase breakdown recorded by
``merge_batch`` (plan / stats-job / write-job) plus the replay loop's
own overhead (total - merge phases), at one parallelism level. Used to
attack the SERIAL per-batch cost: with T = W/N + S per batch, S caps
N->4N scaling efficiency at ((W/N+S)/(W/4N+S))/4 — measured ~0.95 s of
S per batch at round 3 start, which alone caps 2->8 efficiency at ~0.79.

Usage: taskset -c 5,22,23,24,25,28,29,30 python BENCH/profile_batch.py \
           [--cores 8] [--events 1000000] [--batches 4] [--mode mor]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--mode", default="mor")
    ap.add_argument("--content-scale", type=int, default=4)
    ap.add_argument("--lww", default="agg", choices=["agg", "broadcast", "salted"])
    ap.add_argument(
        "--depth", type=int, default=2,
        help="replay pipeline depth (1 = sequential: per-batch phases "
        "are exclusive and include stats_wait; >1 = pipelined: plan/"
        "write/commit phases recorded per batch, spans overlap)",
    )
    args = ap.parse_args()

    os.environ.setdefault("ETL_SPARK_MAX_PARTITION_BYTES", "16m")
    os.environ.setdefault("ETL_SPARK_ADVISORY_PARTITION", "8m")
    from etl_spark.session import build_session
    from etl_spark.cdc.changelog import generate_changelog
    from etl_spark.cdc.replay import ReplayEngine

    spark = build_session(
        f"profile-{args.cores}", master=f"local[{args.cores}]",
        extra_conf={"spark.local.dir": f"/dev/shm/spark-prof-{args.cores}"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp(prefix="prof_", dir="/dev/shm")
    try:
        par = spark.sparkContext.defaultParallelism
        log_path = os.path.join(wd, "log")
        generate_changelog(
            spark, args.events, seed=42, n_repos=200, paths_per_repo=500,
            hot_share=0.3, num_batches=args.batches, parallelism=par,
            content_scale=args.content_scale,
        ).write.mode("overwrite").parquet(log_path)
        changelog = spark.read.parquet(log_path)

        # warmup (same as bench.py)
        warm = generate_changelog(spark, 50_000, seed=7, n_repos=20, paths_per_repo=50,
                                  num_batches=1, parallelism=par)
        weng = ReplayEngine(spark, os.path.join(wd, "w"), num_buckets=max(16, par),
                            mode=args.mode, lww_strategy=args.lww)
        weng.replay(warm)
        if args.mode == "mor":
            weng.compact(min_files=1)
        weng.read_state().count()

        t0 = time.monotonic()
        eng = ReplayEngine(spark, os.path.join(wd, "t"), num_buckets=max(16, par),
                           mode=args.mode, lww_strategy=args.lww)
        results = eng.replay(changelog, pipeline_depth=args.depth)
        t_replay = time.monotonic() - t0
        t1 = time.monotonic()
        if args.mode == "mor":
            eng.compact(min_files=2)
        t_compact = time.monotonic() - t1
        wall = time.monotonic() - t0

        rows = []
        for r in results:
            tm = r.get("timings_ms", {})
            merge_ms = sum(tm.values())
            rows.append({
                "batch": r["batch_id"], "total_ms": r["duration_ms"],
                **tm, "loop_ms": r["duration_ms"] - merge_ms,
            })
        print(json.dumps({
            "cores": args.cores, "events": args.events, "mode": args.mode, "lww": args.lww,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(args.events / wall, 1),
            "replay_sec": round(t_replay, 3), "compact_sec": round(t_compact, 3),
            "per_batch": rows,
        }, indent=1))
    finally:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
