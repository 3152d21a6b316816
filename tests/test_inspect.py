"""Metadata inspect tables (Iceberg ``snapshots``/``files`` analog).

The maintenance-planner's view of a 100 TB table must come from the
manifest, not from data files: these tests pin that ``snapshots_df`` /
``files_df`` agree exactly with the engine's own metadata accessors
(describe / bucket_summary) and with the on-disk truth, through
commits, compaction, retention and a WAP window.
"""

from __future__ import annotations

import json

import pytest

from etl_spark.cdc.changelog import generate_changelog
from etl_spark.cdc.replay import ReplayEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("inspect")
    log = generate_changelog(
        spark, 2000, seed=42, n_repos=5, paths_per_repo=20, num_batches=3
    )
    eng = ReplayEngine(spark, str(root / "t"), num_buckets=8, mode="mor")
    eng.replay(log)
    return eng


def test_snapshots_df_matches_history(engine):
    df = engine.table.snapshots_df().toPandas().sort_values("version")
    versions = engine.table._snapshot_versions()
    assert list(df["version"]) == versions
    cur = df.iloc[-1]
    d = engine.describe()
    # the newest row IS describe()'s snapshot, field for field
    assert cur["version"] == d["version"]
    assert cur["files"] == d["files"]
    assert cur["bytes"] == d["bytes"]
    assert cur["rows_in_files"] == d["rows_in_files"]
    assert cur["delta_files"] == d["delta_files"]
    assert cur["num_buckets"] == d["num_buckets"]
    assert not cur["wap_staged"]
    assert cur["fence_offset"] == d["fence_offset"]
    # history is monotone in version and cumulative in files for a
    # pure-append mor replay (no compaction ran in this fixture)
    assert df["files"].is_monotonic_increasing


def test_files_df_matches_bucket_summary(engine):
    fdf = engine.table.files_df().toPandas()
    summary = {s["bucket"]: s for s in engine.table.bucket_summary()}
    by_bucket = fdf.groupby("bucket")
    assert set(by_bucket.groups) == set(summary)
    for b, grp in by_bucket:
        assert len(grp) == summary[b]["files"]
        assert grp["bytes"].sum() == summary[b]["bytes"]
        assert grp["rows"].sum() == summary[b]["rows"]
        assert (grp["kind"] == "delta").sum() == summary[b]["delta_files"]
    # recorded stats parse and carry the key columns' min/max (keyed by
    # column id — entries stay interpretable across renames)
    stats = [json.loads(s) for s in fdf["stats_json"].dropna()]
    assert stats, "stats recorded for fresh writes"
    assert all(isinstance(s, dict) and s for s in stats)


def test_files_df_tracks_compaction(spark, tmp_path):
    log = generate_changelog(
        spark, 1500, seed=7, n_repos=4, paths_per_repo=10, num_batches=3
    )
    eng = ReplayEngine(spark, str(tmp_path / "t"), num_buckets=4, mode="mor")
    eng.replay(log)
    before = eng.table.files_df().toPandas()
    assert (before["kind"] == "delta").any()
    eng.compact(min_files=1)
    after = eng.table.files_df().toPandas()
    assert not (after["kind"] == "delta").any()
    assert len(after) < len(before)
    # snapshots_df sees both worlds: the pre-compaction snapshot still
    # reports its delta files, the new one reports none
    sdf = eng.table.snapshots_df().toPandas().sort_values("version")
    assert sdf.iloc[-1]["delta_files"] == 0
    assert sdf.iloc[-2]["delta_files"] > 0


def test_snapshots_df_survives_retention(spark, tmp_path):
    log = generate_changelog(
        spark, 1000, seed=3, n_repos=3, paths_per_repo=10, num_batches=4
    )
    eng = ReplayEngine(spark, str(tmp_path / "t"), num_buckets=4)
    eng.replay(log)
    eng.table.expire_snapshots(keep_last=2)
    df = eng.table.snapshots_df().toPandas()
    assert len(df) == 2
    assert df["version"].max() == eng.table.current_snapshot().version
