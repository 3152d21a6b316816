"""Metadata-only column drop (the fourth DDL kind, completing
add/rename/widen): in-flight through replay, id-based projection of old
files, fresh-id semantics on re-add, time travel, and the guard set.
Reference analog: the reference drops columns by re-selecting frames
per run (e.g. ``src/jobs/indkoebsdata.py`` column pruning); here it is
a versioned, crash-safe DDL event like the rest of the evolution family.
"""

import json

import pytest

from etl_spark.cdc.changelog import generate_changelog
from etl_spark.cdc.evolution import apply_evolution_op
from etl_spark.cdc.replay import ReplayEngine
from etl_spark.schema import SCHEMA_EVOLUTION_SCHEMA
from etl_spark.table.manifest import ColumnDef, ManifestTable, TableSchema


@pytest.fixture(scope="module")
def changelog(spark):
    df = generate_changelog(spark, 1200, seed=7, n_repos=4, paths_per_repo=10, num_batches=3)
    df.cache()
    df.count()
    return df


def _ops(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_EVOLUTION_SCHEMA)


def test_drop_through_replay_preserves_row_content(spark, tmp_path, changelog):
    """Dropping a payload column mid-replay must not disturb any other
    column: final state equals a plain replay minus the dropped column,
    sha256 fingerprints included."""
    ops = _ops(spark, [(810, "drop_column", "lang", None)])
    eng = ReplayEngine(spark, str(tmp_path / "t"), num_buckets=4)
    eng.replay(changelog, schema_ops=ops)
    state = eng.read_state()
    assert "lang" not in state.columns

    plain = ReplayEngine(spark, str(tmp_path / "plain"), num_buckets=4)
    plain.replay(changelog)
    want = {
        (r["repo"], r["path"]): (r["commit"], r["content_sha256"])
        for r in plain.read_state().collect()
    }
    got = {
        (r["repo"], r["path"]): (r["commit"], r["content_sha256"])
        for r in state.collect()
    }
    assert got == want


def test_drop_is_metadata_only(spark, tmp_path, changelog):
    """No data file is rewritten by the drop commit."""
    eng = ReplayEngine(spark, str(tmp_path / "t2"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    files_before = {
        e["path"] for es in eng.table.current_snapshot().files.values() for e in es
    }
    eng.table.drop_column("lang")
    files_after = {
        e["path"] for es in eng.table.current_snapshot().files.values() for e in es
    }
    assert files_before == files_after


def test_drop_then_readd_never_resurrects(spark, tmp_path, changelog):
    """Re-adding a dropped NAME allocates a new column id (Iceberg
    semantics): rows written before the re-add read the new column's
    default, never the pre-drop values that are still sitting in the
    old parquet bytes."""
    ops = _ops(
        spark,
        [
            (450, "drop_column", "lang", None),
            (805, "add_column", "lang", json.dumps({"type": "string"})),
        ],
    )
    eng = ReplayEngine(spark, str(tmp_path / "t3"), num_buckets=4)
    eng.replay(changelog, schema_ops=ops)
    state = eng.read_state()
    assert "lang" in state.columns

    # ids differ across the drop/re-add
    snap = eng.table.current_snapshot()
    v1_lang = next(c for c in snap.schemas[1].columns if c.name == "lang")
    cur_lang = next(c for c in snap.schema.columns if c.name == "lang")
    assert cur_lang.id != v1_lang.id

    # DDL applies at batch granularity (an op whose offset falls inside a
    # batch's range is applied before merging that batch): winners written
    # by batches before the re-add read the default (null); winners from
    # the re-add batch onward carry the event's lang again
    rows = state.select("lang", "_ingest_batch").collect()
    assert all(
        (r["lang"] is None) == (r["_ingest_batch"] < 2) for r in rows
    ), "pre-re-add winners must read null; post-re-add winners the event value"
    assert any(r["lang"] is not None for r in rows)


def test_drop_mor_cow_parity_and_compaction(spark, tmp_path, changelog):
    """Both modes replay a drop to the same final state; compaction under
    the post-drop schema preserves it."""
    ops = _ops(spark, [(805, "drop_column", "lang", None)])
    cow = ReplayEngine(spark, str(tmp_path / "cow"), num_buckets=4, mode="cow")
    cow.replay(changelog, schema_ops=ops)
    mor = ReplayEngine(spark, str(tmp_path / "mor"), num_buckets=4, mode="mor",
                       compact_threshold=0)
    mor.replay(changelog, schema_ops=ops)

    def snap(e):
        return {
            (r["repo"], r["path"]): (r["commit"], r["content_sha256"])
            for r in e.read_state().collect()
        }

    assert "lang" not in cow.read_state().columns
    assert snap(cow) == snap(mor)
    mor.compact(min_files=2)
    assert snap(cow) == snap(mor)


def test_drop_time_travel(spark, tmp_path, changelog):
    """A pre-drop snapshot still reads the column with its values."""
    eng = ReplayEngine(spark, str(tmp_path / "tt"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    before = eng.table.current_snapshot()
    eng.table.drop_column("lang")
    assert "lang" not in eng.read_state().columns
    old = eng.table.read(snapshot=before)
    assert "lang" in old.columns
    assert old.filter("lang is not null").count() > 0


def test_drop_not_reapplied_on_batch_retry(spark, tmp_path, changelog):
    """The applied_schema_ops fence covers drops: re-applying the op's
    batch neither re-runs the DDL (which would raise on the now-missing
    column) nor bumps the schema version."""
    ops = _ops(spark, [(810, "drop_column", "lang", None)])
    eng = ReplayEngine(spark, str(tmp_path / "t4"), num_buckets=4)
    eng.replay(changelog, schema_ops=ops)
    sv = eng.table.current_snapshot().current_schema_version
    r = eng.apply_batch(changelog, 2, schema_ops=ops)
    assert r["skipped"]
    assert eng.table.current_snapshot().current_schema_version == sv


def test_drop_guards(spark, tmp_path):
    t = ManifestTable.create(
        spark,
        str(tmp_path / "g"),
        TableSchema([
            ColumnDef(1, "k", "string"),
            ColumnDef(2, "v", "long"),
            ColumnDef(3, "content", "string"),
            ColumnDef(4, "content_sha256", "string"),
            ColumnDef(5, "_deleted", "boolean", False),
        ]),
        key_columns=["k"],
        num_buckets=2,
    )
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="engine-managed"):
        t.drop_column("content_sha256")
    with pytest.raises(ValueError, match="engine-managed"):
        t.drop_column("_deleted")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")
    # the CDC layer pins content (sha256 invariant); the table layer alone
    # would allow it
    with pytest.raises(ValueError, match="content_sha256"):
        apply_evolution_op(t, "drop_column", "content", None)
    # v is droppable, and the schema version advances exactly once
    sv0 = t.current_snapshot().current_schema_version
    t.drop_column("v")
    snap = t.current_snapshot()
    assert snap.current_schema_version == sv0 + 1
    assert "v" not in snap.schema.names()
