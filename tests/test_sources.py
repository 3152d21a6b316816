"""Source connectors: CSV dialects, byte repair, discovery, coercion."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.sources import (
    coerce_string_columns,
    discover_files,
    latest_file,
    read_csv_danish,
    read_csv_headerless,
    read_csv_pruned,
    read_csv_repaired,
    read_csv_tab,
)
from etl_spark.sources.coerce import infer_cast_plan


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "csv"
    d.mkdir()
    return d


def test_read_csv_danish_decimal_comma(spark, csv_dir):
    p = csv_dir / "danish.csv"
    p.write_text("navn;beløb;antal\nA;12,50;3\nB;0,25;7\n", encoding="utf-8")
    df = read_csv_danish(spark, str(p), decimal_columns=["beløb"])
    rows = {r["navn"]: (r["beløb"], r["antal"]) for r in df.collect()}
    assert rows["A"] == (12.50, "3")
    assert rows["B"][0] == 0.25


def test_read_csv_pruned_dates_and_empties(spark, csv_dir):
    p = csv_dir / "pruned.csv"
    p.write_text("Uge;Ydelse;Kommentar;Ekstra\n2024-01-01;X;;drop\n2024-02-05;Y; ;drop\n")
    df = read_csv_pruned(
        spark, str(p), columns=["Uge", "Ydelse", "Kommentar"], date_columns={"Uge": "yyyy-MM-dd"}
    )
    assert df.columns == ["Uge", "Ydelse", "Kommentar"]
    rows = df.orderBy("Uge").collect()
    assert str(rows[0]["Uge"]) == "2024-01-01"
    # empty-string cells stay strings, not null (na_filter=False semantics)
    assert rows[0]["Kommentar"] == ""
    assert rows[1]["Kommentar"] == " "


def test_read_csv_headerless_imposed_schema(spark, csv_dir):
    p = csv_dir / "nohdr.csv"
    p.write_text("1;x;2024\n2;y;2025\n")
    df = read_csv_headerless(spark, str(p), ["id", "code", "year"])
    assert df.columns == ["id", "code", "year"]
    assert [f.dataType for f in df.schema.fields] == [T.StringType()] * 3
    assert df.count() == 2


def test_read_csv_tab_legacy_encoding(spark, csv_dir):
    p = csv_dir / "tab.csv"
    # cp1252 and iso-8859-1 agree on the Danish letters; Spark 4 only
    # whitelists the latter
    p.write_bytes("Søren\t100\nÅse\t200\n".encode("cp1252"))
    schema = T.StructType(
        [T.StructField("navn", T.StringType()), T.StructField("v", T.StringType())]
    )
    df = read_csv_tab(spark, str(p), schema)
    assert {r["navn"] for r in df.collect()} == {"Søren", "Åse"}


def test_read_csv_repaired_excel_quoting_and_headers(spark, csv_dir):
    p = csv_dir / "broken.csv"
    p.write_text('id;navn;\n="0123";"Randers";x1\n="0456";Aarhus;x2\n')
    df = read_csv_repaired(spark, str(p), n_columns=3)
    assert df.columns[:2] == ["id", "navn"]
    assert df.columns[2].startswith("n/a")
    rows = {r["id"]: r["navn"] for r in df.collect()}
    assert rows == {"0123": "Randers", "0456": "Aarhus"}


def test_read_csv_repaired_keeps_header_lookalike_rows(spark, csv_dir):
    """Only the first physical line is the header — a DATA line that is
    byte-identical to it must survive the scan."""
    p = csv_dir / "lookalike.csv"
    p.write_text("id;navn\n1;A\nid;navn\n2;B\n")
    df = read_csv_repaired(spark, str(p))
    rows = sorted((r["id"], r["navn"]) for r in df.collect())
    assert rows == [("1", "A"), ("2", "B"), ("id", "navn")]


def test_read_csv_multifile_concat(spark, csv_dir):
    """S6: per-file headers are skipped natively on a multi-file scan."""
    from etl_spark.sources.csv import read_csv_multifile

    (csv_dir / "part1.csv").write_text("id;v\n1;a\n2;b\n")
    (csv_dir / "part2.csv").write_text("id;v\n3;c\n")
    df = read_csv_multifile(spark, [str(csv_dir / "part1.csv"), str(csv_dir / "part2.csv")])
    assert df.columns == ["id", "v"]
    assert sorted((r["id"], r["v"]) for r in df.collect()) == [("1", "a"), ("2", "b"), ("3", "c")]


def test_infer_cast_plan_sampled(spark):
    """Sampled inference lands on the same plan for homogeneous columns
    (the 100 TB bound on the voting pass)."""
    df = spark.range(2000).select(
        F.col("id").cast("string").alias("i"),
        F.concat(F.col("id").cast("string"), F.lit(",5")).alias("d"),
    )
    exact = infer_cast_plan(df)
    sampled = infer_cast_plan(df, sample_fraction=0.05)
    assert exact == sampled == {"i": "bigint", "d": "double"}


def test_read_config_csv_split(spark, csv_dir):
    """S18: trimmed config scan split into two filtered frames."""
    from etl_spark.sources.csv import read_config_csv, split_by_predicate

    p = csv_dir / "excluded.csv"
    p.write_text(
        "InstitutionIdentifier; DepartmentIdentifier; DepartmentName\n"
        "AB; -; \n"
        "CD; 123 ; Teknik \n"
        "EF;456;Kultur\n"
    )
    cfg = read_config_csv(spark, str(p))
    insts, depts = split_by_predicate(cfg, "DepartmentIdentifier = '-'")
    assert [r["InstitutionIdentifier"] for r in insts.collect()] == ["AB"]
    got = {r["InstitutionIdentifier"]: (r["DepartmentIdentifier"], r["DepartmentName"])
           for r in depts.collect()}
    assert got == {"CD": ("123", "Teknik"), "EF": ("456", "Kultur")}


def test_discovery_glob_and_latest(spark, tmp_path, sf_dir):
    import shutil
    import time as _t

    a = tmp_path / "drop_a.parquet"
    b = tmp_path / "drop_b.parquet"
    shutil.copy(f"{sf_dir}/region.parquet", a)
    _t.sleep(1.1)
    shutil.copy(f"{sf_dir}/nation.parquet", b)
    meta = discover_files(spark, str(tmp_path / "drop_*.parquet"))
    assert meta.count() == 2
    assert latest_file(spark, str(tmp_path / "drop_*.parquet")).endswith("drop_b.parquet")


def test_infer_cast_plan_votes(spark):
    df = spark.createDataFrame(
        [("1", "2,5", "2024-01-02", "2024-01-02 03:04:05", "abc", "")],
        ["i", "d", "dt", "ts", "s", "empty"],
    )
    plan = infer_cast_plan(df)
    assert plan["i"] == "bigint"
    assert plan["d"] == "double"  # comma decimal normalized
    assert plan["dt"] == "date"  # bare date, not timestamp
    assert plan["ts"] == "timestamp_ntz"
    assert plan["s"] == "string"
    assert plan["empty"] == "string"  # no votes -> stays string


def test_coerce_round_trip_types(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("ts").cast("string").alias("ts"),
        F.col("value").cast("string").alias("value"),
    )
    out = coerce_string_columns(e)
    types = dict(out.dtypes)
    assert types == {"event_id": "bigint", "ts": "timestamp_ntz", "value": "double"}
    # lossless round trip
    orig = spark.read.parquet(f"{sf_dir}/events.parquet")
    diff = (
        out.alias("a")
        .join(orig.alias("b"), "event_id")
        .filter((F.col("a.ts") != F.col("b.ts")) | (F.col("a.value") != F.col("b.value")))
    )
    assert diff.count() == 0


def test_xml_flatten_records(spark):
    """S7/S8: XML documents -> relational rows via recursive flatten."""
    from etl_spark.sources import read_xml_rows

    doc = """<GetInstitution>
      <Institution><InstitutionIdentifier>II</InstitutionIdentifier>
        <InstitutionName>Randers</InstitutionName>
        <Meta><Region>Midt</Region></Meta></Institution>
      <Institution><InstitutionIdentifier>XX</InstitutionIdentifier>
        <InstitutionName>Aarhus</InstitutionName></Institution>
    </GetInstitution>"""
    df = spark.createDataFrame([(1, doc), (2, None)], ["src_id", "xml"])
    out = read_xml_rows(
        df, "xml", "Institution",
        "InstitutionIdentifier string, InstitutionName string, Region string",
    )
    rows = {r["InstitutionIdentifier"]: (r["InstitutionName"], r["Region"], r["src_id"])
            for r in out.collect()}
    assert rows == {"II": ("Randers", "Midt", 1), "XX": ("Aarhus", None, 1)}


def test_xml_flatten_element_semantics():
    """Pure flatten rule matches the reference: leaves collected, nested
    descended, text-only element falls back to its own tag."""
    import xml.etree.ElementTree as ET

    from etl_spark.sources import flatten_element

    e = ET.fromstring("<R><A>1</A><B><C>2</C><D>3</D></B></R>")
    assert flatten_element(e) == {"A": "1", "C": "2", "D": "3"}


def test_sinks_replace_append_chunked_ensure(spark, tmp_path, sf_dir):
    from etl_spark.table.sinks import (
        append_table,
        ensure_table,
        export_csv,
        replace_table,
        write_options,
    )

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    p = str(tmp_path / "t1")
    replace_table(n, p)
    replace_table(n, p)  # idempotent full replace
    assert spark.read.parquet(p).count() == n.count()
    append_table(n, p)
    assert spark.read.parquet(p).count() == 2 * n.count()

    # chunked: maxRecordsPerFile bounds rows per part file
    p2 = str(tmp_path / "t2")
    replace_table(n, p2, **write_options(batch_rows=5))
    import glob

    parts = glob.glob(p2 + "/part-*")
    assert len(parts) >= n.count() // 5
    assert spark.read.parquet(p2).count() == n.count()

    p3 = str(tmp_path / "t3")
    export_csv(n.select("n_name", "n_nationkey"), p3)
    got = spark.read.option("sep", ";").option("header", True).csv(p3)
    assert got.count() == n.count()

    t = ensure_table(spark, str(tmp_path / "mt"), [(1, "k", "string"), (2, "v", "long")], ["k"])
    t2 = ensure_table(spark, str(tmp_path / "mt"), [(1, "k", "string"), (2, "v", "long")], ["k"])
    assert t2.current_snapshot().version == t.current_snapshot().version
