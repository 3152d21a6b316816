#!/usr/bin/env python
"""N-vs-4N EXECUTOR scaling on a local Spark standalone cluster.

The north rule asks for throughput scaling efficiency >= 0.8 from N to
4N executors on a multi-executor cluster. This harness builds that
cluster shape for real on the sandbox machine:

- one standalone Master,
- four Workers, each pinned (taskset) to its own disjoint 2-CPU set —
  four separate 2-core executor JVMs, exactly how production packs
  hosts (many small executors, not one giant JVM; a 32-thread single
  JVM suffers allocation/GC contention that real deployments avoid),
- the same replay job submitted twice: ``spark.cores.max=2`` (N=1
  executor) vs ``spark.cores.max=8`` (4N=4 executors), identical
  deterministic input, data + shuffle on tmpfs.

    efficiency = (events_per_sec@4exec / events_per_sec@1exec) / 4

Prints one JSON line and appends to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"


def _spawn(cmd: list[str], env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )


def start_cluster(n_workers: int, cores_per_worker: int, worker_mem: str) -> list[subprocess.Popen]:
    env = dict(os.environ)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    procs = [_spawn(
        [f"{SPARK_HOME}/bin/spark-class", "org.apache.spark.deploy.master.Master",
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0"], env)]
    time.sleep(4)
    for i in range(n_workers):
        cpu = f"{i * cores_per_worker}-{(i + 1) * cores_per_worker - 1}"
        wd = f"/dev/shm/worker-{i}"
        os.makedirs(wd, exist_ok=True)
        procs.append(_spawn(
            ["taskset", "-c", cpu,
             f"{SPARK_HOME}/bin/spark-class", "org.apache.spark.deploy.worker.Worker",
             MASTER_URL, "--cores", str(cores_per_worker), "--memory", worker_mem,
             "--work-dir", wd, "--webui-port", "0"], env))
    time.sleep(6)
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGTERM)
        except ProcessLookupError:
            pass
    time.sleep(2)


_CHILD = r"""
import json, sys, tempfile, shutil, os
sys.path.insert(0, {repo!r})
os.environ.setdefault("ETL_SPARK_MAX_PARTITION_BYTES", "16m")
os.environ.setdefault("ETL_SPARK_ADVISORY_PARTITION", "8m")
import subprocess
zip_path = "/dev/shm/etl_spark_pkg.zip"
if not os.path.exists(zip_path):
    subprocess.run(["zip", "-qr", zip_path, "etl_spark"], cwd={repo!r}, check=True)
from etl_spark.session import build_session
from bench import bench_cdc_replay
spark = build_session("cluster-{tag}", master={master!r}, extra_conf={{
    "spark.cores.max": "{cores_max}",
    "spark.executor.cores": "2",
    "spark.executor.memory": "4g",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=2",
}})
spark.sparkContext.addPyFile(zip_path)
spark.sparkContext.setLogLevel("ERROR")
wd = tempfile.mkdtemp(prefix="clus_{tag}_", dir="/dev/shm")
try:
    r = bench_cdc_replay(spark, {events}, {batches}, wd, {mode!r}, content_scale={content_scale})
finally:
    shutil.rmtree(wd, ignore_errors=True)
print("RESULT " + json.dumps(r))
"""


def run_level(tag: str, cores_max: int, events: int, batches: int, mode: str, content_scale: int) -> dict:
    code = _CHILD.format(repo=REPO, tag=tag, master=MASTER_URL, cores_max=cores_max,
                         events=events, batches=batches, mode=mode, content_scale=content_scale)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         cwd=REPO, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{tag} produced no result:\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--mode", default="mor")
    ap.add_argument("--content-scale", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    procs = start_cluster(n_workers=4, cores_per_worker=2, worker_mem="6g")
    try:
        lo_runs, hi_runs = [], []
        for i in range(args.repeats):
            lo_runs.append(run_level("n1", 2, args.events, args.batches, args.mode, args.content_scale))
            hi_runs.append(run_level("n4", 8, args.events, args.batches, args.mode, args.content_scale))
            print(json.dumps({"repeat": i, "exec1_eps": lo_runs[-1]["events_per_sec"],
                              "exec4_eps": hi_runs[-1]["events_per_sec"]}), flush=True)
    finally:
        stop_cluster(procs)
        subprocess.run(["rm", "-rf", "/dev/shm/etl_spark_pkg.zip"] +
                       [f"/dev/shm/worker-{i}" for i in range(4)])

    lo = max(lo_runs, key=lambda r: r["events_per_sec"])
    hi = max(hi_runs, key=lambda r: r["events_per_sec"])
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4
    result = {
        "metric": "cdc_replay_executor_scaling_efficiency",
        "cluster": "standalone, 4 workers x 2 pinned cores",
        "events": args.events, "batches": args.batches, "mode": args.mode,
        "content_scale": args.content_scale,
        "executors_1": lo, "executors_4": hi,
        "speedup": round(hi["events_per_sec"] / lo["events_per_sec"], 3),
        "efficiency": round(eff, 3), "target": 0.8, "pass": eff >= 0.8,
        "all_exec1_eps": [r["events_per_sec"] for r in lo_runs],
        "all_exec4_eps": [r["events_per_sec"] for r in hi_runs],
    }
    print(json.dumps(result))

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""
## Executor scaling run {stamp} (standalone cluster)

Real multi-executor form of the criterion: one standalone master, four
worker JVMs each pinned to a disjoint 2-CPU set; the SAME job submitted
with `spark.cores.max` = 2 (one 2-core executor) vs 8 (four 2-core
executors); {args.events:,} events x ~{args.content_scale * 430} B, mode={args.mode},
replay + compaction timed, identical final state.

| executors | wall (s) | events/sec |
|---|---|---|
| 1 x 2-core | {lo["wall_sec"]} | {lo["events_per_sec"]} |
| 4 x 2-core | {hi["wall_sec"]} | {hi["events_per_sec"]} |

Speedup {result["speedup"]}x over 4x executors -> **efficiency
{result["efficiency"]}** (target >= 0.8: {"PASS" if result["pass"] else "MISS"}).
""")


if __name__ == "__main__":
    main()
