"""Schema evolution through replay (FIXTURES.md invariant 4)."""

import json

import pytest

from etl_spark.cdc.changelog import generate_changelog
from etl_spark.cdc.replay import ReplayEngine
from etl_spark.schema import SCHEMA_EVOLUTION_SCHEMA
from etl_spark.table.manifest import ColumnDef, ManifestTable, TableSchema


@pytest.fixture(scope="module")
def changelog(spark):
    df = generate_changelog(spark, 1200, seed=42, n_repos=4, paths_per_repo=10, num_batches=3)
    df.cache()
    df.count()
    return df


def _ops(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_EVOLUTION_SCHEMA)


def test_add_rename_widen_through_replay(spark, tmp_path, changelog):
    # batch 0: plain. batch 1: add size_bytes int. batch 2: rename lang ->
    # language and widen size_bytes to long.
    ops = _ops(
        spark,
        [
            (450, "add_column", "size_bytes", json.dumps({"type": "int"})),
            (810, "rename_column", "lang", json.dumps({"new_name": "language"})),
            (815, "widen_type", "size_bytes", json.dumps({"new_type": "long"})),
        ],
    )
    eng = ReplayEngine(spark, str(tmp_path / "t"), num_buckets=4)
    results = eng.replay(changelog, schema_ops=ops)
    assert [r["schema_ops"] for r in results] == [0, 1, 2]

    state = eng.read_state()
    assert "language" in state.columns and "lang" not in state.columns
    assert "size_bytes" in state.columns
    assert dict(state.dtypes)["size_bytes"] == "bigint"
    # pre-evolution rows readable with default (null)
    assert state.filter("size_bytes is null").count() == state.count()
    # wire events carried `lang`; rename maps it into `language` for every row
    assert state.filter("language is null").count() == 0

    # evolution ops are fenced: re-applying a batch doesn't re-run DDL
    r = eng.apply_batch(changelog, 2, schema_ops=ops)
    assert r["skipped"]
    assert eng.table.current_snapshot().current_schema_version == 4  # 1 + 3 ops


def test_evolution_state_matches_plain_replay(spark, tmp_path, changelog):
    """Metadata-only evolution must not disturb row content."""
    from tests.oracle import apply_log_oracle

    ops = _ops(spark, [(450, "add_column", "size_bytes", json.dumps({"type": "int"}))])
    eng = ReplayEngine(spark, str(tmp_path / "t2"), num_buckets=4)
    eng.replay(changelog, schema_ops=ops)
    got = (
        eng.read_state()
        .select("repo", "path", "commit", "lang", "content", "content_sha256")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = apply_log_oracle(changelog.toPandas())
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_widen_rejects_narrowing(spark, tmp_path):
    t = ManifestTable.create(
        spark,
        str(tmp_path / "t3"),
        TableSchema([ColumnDef(1, "k", "string"), ColumnDef(2, "v", "long")]),
        key_columns=["k"],
        num_buckets=2,
    )
    with pytest.raises(ValueError):
        t.widen_type("v", "int")


def test_old_files_not_rewritten(spark, tmp_path, changelog):
    """Evolution is metadata-only: data files of prior snapshots survive."""
    eng = ReplayEngine(spark, str(tmp_path / "t4"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    files_before = {
        e["path"] for es in eng.table.current_snapshot().files.values() for e in es
    }
    eng.table.add_column("extra", "string")
    files_after = {
        e["path"] for es in eng.table.current_snapshot().files.values() for e in es
    }
    assert files_before == files_after


def test_evolution_under_merge_on_read(spark, tmp_path, changelog):
    """Delta files written under different schema versions are projected
    by column id at read time: mor replay with in-flight evolution ends
    in the same state as cow replay with the same ops."""
    ops = _ops(
        spark,
        [
            (405, "add_column", "size_bytes", json.dumps({"type": "int", "default": 0})),
            (805, "rename_column", "lang", json.dumps({"new_name": "language"})),
        ],
    )
    cow = ReplayEngine(spark, str(tmp_path / "cow"), num_buckets=4, mode="cow")
    cow.replay(changelog, schema_ops=ops)
    mor = ReplayEngine(spark, str(tmp_path / "mor"), num_buckets=4, mode="mor",
                       compact_threshold=0)
    mor.replay(changelog, schema_ops=ops)

    def snap(e):
        return {
            (r["repo"], r["path"]): (r["commit"], r["language"], r["size_bytes"], r["content_sha256"])
            for r in e.read_state().collect()
        }

    assert snap(cow) == snap(mor)
    # compaction under the evolved schema preserves it all
    mor.compact(min_files=2)
    assert snap(cow) == snap(mor)


def test_snapshot_time_travel(spark, tmp_path, changelog):
    """Every commit is an immutable snapshot: reading an old snapshot
    returns the table exactly as of that commit (Iceberg-parity
    time travel on the manifest format)."""
    eng = ReplayEngine(spark, str(tmp_path / "tt"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    snap_after_b0 = eng.table.current_snapshot()
    state_b0 = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.table.read(snapshot=snap_after_b0).collect()
    }
    eng.replay(changelog, batches=[1, 2])
    # current state moved on...
    now = {(r["repo"], r["path"]): r["commit"] for r in eng.read_state().collect()}
    assert now != state_b0
    # ...but the old snapshot still reads byte-identically
    again = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.table.read(snapshot=snap_after_b0).collect()
    }
    assert again == state_b0


def test_rename_onto_existing_name_refused(spark, tmp_path, changelog):
    """A duplicate-name schema silently corrupts every by-name lookup —
    rename refuses a taken target like add_column refuses a taken name."""
    eng = ReplayEngine(spark, str(tmp_path / "t_collide"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    with pytest.raises(ValueError, match="already exists"):
        eng.table.rename_column("lang", "content")
    # schema unchanged: no version bump, no duplicate names
    names = [c.name for c in eng.table.current_snapshot().schema.columns]
    assert names.count("content") == 1 and "lang" in names


def test_key_and_engine_column_renames_refused(spark, tmp_path, changelog):
    """key_columns and the engine's write path reference these names
    every batch — a rename would wedge the NEXT merge after the DDL
    already committed a schema version."""
    eng = ReplayEngine(spark, str(tmp_path / "t_guard"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    with pytest.raises(ValueError, match="key column"):
        eng.table.rename_column("repo", "repository")
    with pytest.raises(ValueError, match="engine-managed"):
        eng.table.rename_column("_deleted", "gone")


def test_widen_key_column_refused(spark, tmp_path):
    """murmur3(int x) != murmur3(long x): widening a key re-routes every
    stored key to a different bucket — silent duplicate/undeletable rows."""
    t = ManifestTable.create(
        spark, str(tmp_path / "t_intkey"),
        TableSchema([ColumnDef(1, "k", "int"), ColumnDef(2, "v", "string")]),
        key_columns=["k"], num_buckets=4,
    )
    with pytest.raises(ValueError, match="type-sensitive"):
        t.widen_type("k", "long")


def test_cdc_contract_columns_pinned_against_rename_and_drop(
    spark, tmp_path, changelog
):
    """content (sha256 source) and commit (LWW order, tombstone
    watermark) are referenced by name in every merge — the CDC layer
    refuses rename/drop for both, before any schema version commits."""
    from etl_spark.cdc.evolution import apply_evolution_op

    eng = ReplayEngine(spark, str(tmp_path / "t_pin"), num_buckets=4)
    eng.replay(changelog, batches=[0])
    v0 = eng.table.current_snapshot().version
    for kind, col in [
        ("rename_column", "content"), ("drop_column", "content"),
        ("rename_column", "commit"), ("drop_column", "commit"),
    ]:
        detail = json.dumps({"new_name": "x"}) if kind == "rename_column" else None
        with pytest.raises(ValueError, match="CDC merge references it by name"):
            apply_evolution_op(eng.table, kind, col, detail)
    assert eng.table.current_snapshot().version == v0


def test_doomed_late_op_refused_before_any_batch_applies(
    spark, tmp_path, changelog
):
    """Statically knowable column guards (key/contract/engine-managed)
    are checked up front with the feed contract: a guarded op whose
    batch is LAST must stop the replay before batch 0 commits, not
    half-apply the log and wedge mid-replay."""
    eng = ReplayEngine(spark, str(tmp_path / "t_doomed"), num_buckets=4)
    for kind, col, match in [
        ("rename_column", "commit", "CDC merge references it by name"),
        ("drop_column", "content", "CDC merge references it by name"),
        ("widen_type", "repo", "key column"),
        ("rename_column", "_deleted", "engine-managed"),
    ]:
        detail = (
            json.dumps({"new_name": "x"}) if kind == "rename_column"
            else json.dumps({"new_type": "long"}) if kind == "widen_type"
            else None
        )
        ops = _ops(spark, [(1100, kind, col, detail)])  # inside batch 2
        with pytest.raises(ValueError, match=match):
            eng.replay(changelog, schema_ops=ops)
        assert eng.applied_batches() == []


def test_wal_reserved_names_refused_for_add(spark, tmp_path, changelog):
    """The merge's winner frame carries the WAL's routing columns next to
    the payload, so a stored column named op/offset/batch_id silently
    captures the EVENT's value for every post-DDL winner instead of the
    declared default — refused up front."""
    eng = ReplayEngine(spark, str(tmp_path / "t_reserved"), num_buckets=4)
    for name in ("op", "offset", "batch_id"):
        ops = _ops(spark, [(450, "add_column", name,
                            json.dumps({"type": "string", "default": "Z"}))])
        with pytest.raises(ValueError, match="reserved by the WAL contract"):
            eng.replay(changelog, schema_ops=ops)
        assert eng.applied_batches() == []
    # non-reserved names (including engine-internal temp names, which are
    # dropped before the final select) still work: defaults backfill
    ops = _ops(spark, [(450, "add_column", "__ord",
                        json.dumps({"type": "string", "default": "Z"}))])
    eng.replay(changelog, schema_ops=ops)
    vals = {r[0] for r in eng.read_state().select("__ord").distinct().collect()}
    assert vals == {"Z"}


def test_rename_to_wal_reserved_name_is_safe(spark, tmp_path, changelog):
    """RENAMING a payload column to a WAL routing name is safe — and pinned
    so: the merge projects stored columns by their ORIGINAL wire name
    (the name the column id was first added under), so a column renamed
    to 'op' keeps reading its own wire (here: nothing — defaults), never
    the event's routing value. Contrast with add_column, where the fresh
    id's wire name IS the reserved name and capture would be silent."""
    ops = _ops(
        spark,
        [
            (100, "add_column", "note", json.dumps({"type": "string", "default": "N"})),
            (450, "rename_column", "note", json.dumps({"new_name": "op"})),
        ],
    )
    eng = ReplayEngine(spark, str(tmp_path / "t_rn_reserved"), num_buckets=4)
    eng.replay(changelog, schema_ops=ops)
    state = eng.read_state()
    assert "op" in state.columns
    # batches 1-2 merge post-rename winners; if the projection read the
    # WAL's op instead of the wire, these would be 'U'/'I'/'D'
    vals = {r[0] for r in state.select("op").distinct().collect()}
    assert vals == {"N"}
