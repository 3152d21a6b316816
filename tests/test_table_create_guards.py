"""Create-time schema validation: an unusable schema is refused BEFORE
snapshot v0 commits.

Probed failure modes without the guard: a typo'd column type creates
fine and then every read raises ParseException (same wedge the DDL
dry-run closes for add_column, one layer down at the front door);
duplicate names/ids silently corrupt by-name selects and the by_id
evolution maps; a key column absent from the schema fails only at the
first merge, possibly after files landed; an uncastable default dies at
the first cross-schema-version projection.
"""

import pytest

from etl_spark.table.manifest import ColumnDef, ManifestTable, TableSchema


def _create(spark, tmp_path, name, cols, keys):
    return ManifestTable.create(
        spark, str(tmp_path / name), TableSchema(cols), key_columns=keys,
        num_buckets=2,
    )


def test_unparseable_column_type_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="column 'v'.*not a parseable Spark DDL type"):
        _create(spark, tmp_path, "t1",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "v", "strnig")], ["k"])


def test_duplicate_column_names_refused(spark, tmp_path):
    with pytest.raises(ValueError, match=r"duplicate column names \['k'\]"):
        _create(spark, tmp_path, "t2",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "k", "int")], ["k"])


def test_duplicate_column_ids_refused(spark, tmp_path):
    with pytest.raises(ValueError, match=r"duplicate column ids \[1\]"):
        _create(spark, tmp_path, "t3",
                [ColumnDef(1, "k", "string"), ColumnDef(1, "v", "int")], ["k"])


def test_key_column_missing_from_schema_refused(spark, tmp_path):
    with pytest.raises(ValueError, match=r"key column\(s\) \['nope'\] not in the schema"):
        _create(spark, tmp_path, "t4",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "v", "string")], ["nope"])


def test_uncastable_default_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="column 'v'.*default 'abc' as 'int'"):
        _create(spark, tmp_path, "t5",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "v", "int", "abc")], ["k"])


def test_valid_schema_with_typed_default_and_complex_type_creates(spark, tmp_path):
    t = _create(spark, tmp_path, "t6",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "v", "string"),
                 ColumnDef(3, "n", "int", 5), ColumnDef(4, "tags", "array<string>")],
                ["k"])
    assert t.read().count() == 0
    t.overwrite(spark.createDataFrame(
        [("a", "x", 1, ["t"])], "k string, v string, n int, tags array<string>"))
    assert t.read().count() == 1


def test_case_colliding_column_names_refused(spark, tmp_path):
    """Spark resolves references case-insensitively by default, so 'V'
    next to 'v' passed an exact check and the FIRST write then died
    AMBIGUOUS_REFERENCE (probed) — with snapshot v0 already committed."""
    with pytest.raises(ValueError, match="case-insensitively"):
        _create(spark, tmp_path, "t7",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "V", "string"),
                 ColumnDef(3, "v", "int")], ["k"])


def test_table_api_case_collisions_refused_pure_case_rename_legal(spark, tmp_path):
    t = _create(spark, tmp_path, "t8",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "v", "string"),
                 ColumnDef(3, "w", "int")], ["k"])
    with pytest.raises(ValueError, match="already exists .as 'v'"):
        t.add_column("V", "int")
    with pytest.raises(ValueError, match="already exists .as 'v'"):
        t.rename_column("w", "V")
    # a pure case change collides only with ITSELF — stays legal
    t.rename_column("v", "V")
    assert [c.name for c in t.current_snapshot().schema.columns][:3] == ["k", "V", "w"]


def test_non_identifier_column_names_refused(spark, tmp_path):
    """The engine references columns by bare name (unquoted DDL strings,
    F.col, SQL fragments): 'a.b' resolves as struct access, 'a b' breaks
    the schema parse. Each such name committed fine and then wedged the
    first write or projection (probed) — refused at every entry point."""
    for i, bad in enumerate(["a.b", "a b", "a`b", "a,b", ""]):
        with pytest.raises(ValueError, match="invalid column name"):
            _create(spark, tmp_path, f"tn{i}",
                    [ColumnDef(1, "k", "string"), ColumnDef(2, bad, "string")],
                    ["k"])
    t = _create(spark, tmp_path, "tn_ok",
                [ColumnDef(1, "k", "string"), ColumnDef(2, "v", "string")], ["k"])
    with pytest.raises(ValueError, match="invalid column name"):
        t.add_column("a.b", "string")
    with pytest.raises(ValueError, match="invalid column name"):
        t.rename_column("v", "a b")
    assert t.current_snapshot().current_schema_version == 1
