"""Pipelined copy-on-write replay: state parity with the sequential
loop, resume/exactly-once, and the disjoint-bucket overlap path."""

from pyspark.sql import functions as F

from etl_spark.cdc.changelog import generate_changelog
from etl_spark.cdc.replay import ReplayEngine


def test_cow_pipelined_parity_resume_exactly_once(spark, tmp_path):
    """The cow pipeline (writes overlapped when bucket-disjoint, commits
    ordered) must keep the sequential loop's guarantees: resume from a
    committed prefix applies exactly the unapplied suffix, re-replay is
    a no-op, and the final state equals the sequential engine's."""
    log = generate_changelog(spark, 6000, seed=13, n_repos=5, paths_per_repo=20, num_batches=4)
    log.cache()

    seq = ReplayEngine(spark, str(tmp_path / "seq"), num_buckets=4, mode="cow")
    seq.replay(log, pipeline_depth=1)

    pipe = ReplayEngine(spark, str(tmp_path / "pipe"), num_buckets=4, mode="cow")
    pipe.replay(log, batches=[0, 1], pipeline_depth=2)
    res = pipe.replay(log, pipeline_depth=2)
    assert [r["batch_id"] for r in res if r.get("skipped")] == [0, 1]
    assert [r["batch_id"] for r in res if not r.get("skipped")] == [2, 3]
    assert all(r.get("pipelined") for r in res if not r.get("skipped"))
    res2 = pipe.replay(log, pipeline_depth=2)
    assert all(r["skipped"] for r in res2)

    a = seq.read_state().orderBy("repo", "path").collect()
    b = pipe.read_state().orderBy("repo", "path").collect()
    assert a == b
    m = pipe.metrics().toPandas()
    assert sorted(m["batch_id"]) == [0, 1, 2, 3]


def test_cow_pipelined_disjoint_batches_overlap_correctly(spark, tmp_path):
    """Batches engineered to touch DISJOINT bucket sets exercise the
    true overlap path: batch N+1 plans and writes against the pre-N
    snapshot, then its commit rebases over N's. Final state must equal
    the sequential engine's, and the later batch's commit must not
    erase the earlier one's buckets."""
    log = generate_changelog(
        spark, 4000, seed=17, n_repos=6, paths_per_repo=15, num_batches=1
    ).drop("batch_id")

    # re-batch BY BUCKET: the engine's own layout decides, so batches
    # are bucket-disjoint by construction. Offsets shift so batch
    # ranges ascend — the fence contract is a WAL consumed in batch
    # order; interleaved ranges would (correctly) be fenced off.
    probe = ReplayEngine(spark, str(tmp_path / "probe"), num_buckets=8, mode="cow")
    from etl_spark.table.manifest import bucket_expr

    log = (
        log.withColumn(
            "batch_id",
            (bucket_expr(probe.table.key_columns, 8) % 2).cast("long"),
        )
        .withColumn("offset", F.col("offset") + F.col("batch_id") * F.lit(100_000))
        .cache()
    )
    assert log.select("batch_id").distinct().count() == 2
    # both batches carry real volume (neither is fence-shadowed)
    sizes = {r["batch_id"]: r["count"] for r in log.groupBy("batch_id").count().collect()}
    assert min(sizes.values()) > 1000

    seq = ReplayEngine(spark, str(tmp_path / "seq"), num_buckets=8, mode="cow")
    seq.replay(log, pipeline_depth=1)
    pipe = ReplayEngine(spark, str(tmp_path / "pipe"), num_buckets=8, mode="cow")
    res = pipe.replay(log, pipeline_depth=2)
    assert all(r.get("pipelined") for r in res if not r.get("skipped"))
    by = {r["batch_id"]: r for r in res}
    assert by[0]["rows_in"] > 1000 and by[1]["rows_in"] > 1000

    a = seq.read_state().orderBy("repo", "path").collect()
    b = pipe.read_state().orderBy("repo", "path").collect()
    assert a == b
    assert len(b) > 0
    # both batches' buckets survived into the final snapshot
    touched = {
        r["bucket"]
        for r in pipe.bucket_metrics().select("bucket").distinct().collect()
    }
    final_buckets = set(pipe.table.current_snapshot().files)
    assert touched <= final_buckets


def test_cow_pipelined_intersecting_batches_drain(spark, tmp_path):
    """Hot-key logs (every batch touches most buckets) must still be
    correct: the disjointness gate drains and the result matches the
    global-log LWW oracle via the sequential engine."""
    log = generate_changelog(
        spark, 5000, seed=19, n_repos=3, paths_per_repo=10,
        hot_share=0.6, num_batches=5,
    ).cache()
    seq = ReplayEngine(spark, str(tmp_path / "seq"), num_buckets=4, mode="cow")
    seq.replay(log, pipeline_depth=1)
    pipe = ReplayEngine(spark, str(tmp_path / "pipe"), num_buckets=4, mode="cow")
    pipe.replay(log, pipeline_depth=3)
    a = seq.read_state().orderBy("repo", "path").collect()
    b = pipe.read_state().orderBy("repo", "path").collect()
    assert a == b


def test_cow_pipelined_empty_batch_fences(spark, tmp_path):
    """An empty batch id still fences (exactly-once bookkeeping) on the
    pipelined path."""
    log = generate_changelog(spark, 2000, seed=23, n_repos=4, paths_per_repo=10, num_batches=2)
    log = log.withColumn(
        "batch_id", F.when(F.col("batch_id") == 1, F.lit(2)).otherwise(F.col("batch_id"))
    ).cache()
    eng = ReplayEngine(spark, str(tmp_path / "t"), num_buckets=4, mode="cow")
    res = eng.replay(log, batches=[0, 1, 2], pipeline_depth=2)
    by_id = {r["batch_id"]: r for r in res}
    assert by_id[1]["rows_in"] == 0 and not by_id[1]["skipped"]
    assert sorted(eng.applied_batches()) == [0, 1, 2]
    res2 = eng.replay(log, batches=[0, 1, 2], pipeline_depth=2)
    assert all(r["skipped"] for r in res2)
