"""Contract tests for the round-2 sources (JDBC, offset-paginated,
metadata-driven schema) and the status-code event classifier (C2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.changelog import generate_changelog
from etl_spark.cdc.classify import classify_events
from etl_spark.cdc.replay import ReplayEngine
from etl_spark.sources.jdbc import read_query, read_table, write_table
from etl_spark.sources.metadata import dataframe_from_api_payload, schema_from_metadata
from etl_spark.sources.paged import plan_pages, read_paged
from tests.oracle import apply_log_oracle

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


# ---------------------------------------------------------------- JDBC (S11/S12)
def test_jdbc_partitioned_roundtrip(spark, tmp_path):
    """Partitioned full-table scan against the embedded Derby engine —
    a real JDBC endpoint, no external service. Bounds auto-discovered."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    write_table(df, url, "people", driver=DERBY)

    back = read_table(spark, url, "people", partition_column="id",
                      num_partitions=4, driver=DERBY)
    # the read is split into 4 disjoint range queries (parallel pulls)
    assert back.rdd.getNumPartitions() == 4
    got = back.toPandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 100
    assert list(got["id"]) == list(range(100))
    assert got["name"].iloc[7] == "name-7"

    # explicit bounds path too
    back2 = read_table(spark, url, "people", partition_column="id",
                       num_partitions=3, lower_bound=0, upper_bound=99, driver=DERBY)
    assert back2.count() == 100


def test_jdbc_pushdown_query(spark, tmp_path):
    """S12: the statement runs database-side; Spark sees only results."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    df = spark.range(60).select(
        F.col("id").cast("int").alias("id"), (F.col("id") % 3).cast("int").alias("grp")
    )
    write_table(df, url, "t", driver=DERBY)
    agg = read_query(
        spark, url, 'SELECT "grp", COUNT(*) AS n FROM t GROUP BY "grp"', driver=DERBY
    ).toPandas().sort_values("grp").reset_index(drop=True)
    assert list(agg["grp"]) == [0, 1, 2]
    assert list(agg["N"]) == [20, 20, 20]


# ------------------------------------------------------- paged source (S13/C15)
def _fake_fetch(offset: int, limit: int) -> pd.DataFrame:
    """Deterministic stand-in for a paged REST/ES pull: row i of the
    remote dataset is (i, 'doc-i')."""
    ids = list(range(offset, offset + limit))
    return pd.DataFrame({"id": pd.array(ids, dtype="int64"),
                         "body": [f"doc-{i}" for i in ids]})


def test_plan_pages_edges(spark):
    p = plan_pages(spark, total_count=10, page_size=4).collect()
    assert [(r["offset"], r["limit"]) for r in p] == [(0, 4), (4, 4), (8, 2)]
    assert plan_pages(spark, 0, 100).count() == 0
    p2 = plan_pages(spark, 10, 4, start_offset=6).collect()
    assert [(r["offset"], r["limit"]) for r in p2] == [(6, 4)]


def test_read_paged_equals_single_scan(spark):
    """Fan-out page pulls reassemble the exact remote dataset, pages
    pulled in parallel across partitions rather than a driver loop."""
    got = (
        read_paged(spark, total_count=1003, page_size=100,
                   fetch=_fake_fetch, schema="id long, body string")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == 1003
    assert list(got["id"]) == list(range(1003))
    assert got["body"].iloc[500] == "doc-500"


# ---------------------------------------------------- metadata schema (S10)
def test_metadata_driven_schema(spark):
    payload = {
        "Variables": [
            {"Label": "Periode", "Type": "string"},
            {"Label": "Area", "Type": "string"},
            {"Label": "Antal", "Type": "int"},
            {"Label": "Andel", "Type": "double"},
        ],
        "Data": [
            ["2024M01", "Randers", 120, 3.5],
            ["2024M02", "Randers", 130, 3.7],
        ],
    }
    schema = schema_from_metadata(payload["Variables"])
    assert [f.name for f in schema.fields] == ["Periode", "Area", "Antal", "Andel"]
    assert schema["Antal"].dataType.typeName() == "integer"

    df = dataframe_from_api_payload(spark, payload, rename_map={"Area": "Område"})
    assert df.columns == ["Periode", "Område", "Antal", "Andel"]
    rows = df.orderBy("Periode").collect()
    assert rows[0]["Antal"] == 120 and rows[1]["Andel"] == 3.7
    # unknown type labels fall back to string
    s2 = schema_from_metadata([{"Label": "x", "Type": "mystery"}])
    assert s2["x"].dataType.typeName() == "string"


# --------------------------------------------- multi-level JSON flatten (S9)
def test_flatten_json_column_multilevel(spark):
    """4-level descent with missing keys -> nulls (the reference's .get
    chain semantics, src/jobs/uddannelsesstatistik.py:63-72)."""
    from etl_spark.sources.json_flatten import flatten_json_column

    rows = [
        (1, '{"data": {"attributes": {"results": {"total": 7, "name": "a"}}, "kind": "x"}}'),
        (2, '{"data": {"attributes": {"results": {"total": 9}}}}'),  # name missing
        (3, '{"data": {}}'),  # whole subtree missing
    ]
    df = spark.createDataFrame(rows, "id int, payload string")
    flat = flatten_json_column(
        df, "payload",
        "struct<data: struct<attributes: struct<results: struct<total: int, name: string>>, kind: string>>",
    )
    assert flat.columns == ["id", "data_attributes_results_total",
                            "data_attributes_results_name", "data_kind"]
    got = {r["id"]: (r["data_attributes_results_total"], r["data_attributes_results_name"], r["data_kind"])
           for r in flat.collect()}
    assert got == {1: (7, "a", "x"), 2: (9, None, None), 3: (None, None, None)}


# ------------------------------------------------------ classify_events (C2)
def test_classify_precedence(spark):
    rows = [
        # key A: active ('1') + terminal ('8') -> terminal row suppressed
        ("r1", "a", "1"), ("r1", "a", "8"),
        # key B: only terminal ('9') -> processed (no active row)
        ("r1", "b", "9"),
        # key C: deleted ('S') wins over everything, even with active
        ("r1", "c", "1"), ("r1", "c", "S"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, status string")
    out = classify_events(df).orderBy("path", "status").collect()
    got = [(r["path"], r["status"], r["op"]) for r in out]
    # the terminal row on active key A is suppressed entirely
    assert got == [("a", "1", "U"), ("b", "9", "U"), ("c", "1", "U"), ("c", "S", "D")]


def test_classify_insert_vs_update(spark):
    feed = spark.createDataFrame(
        [("r1", "a", "1"), ("r1", "b", "1")], "repo string, path string, status string"
    )
    existing = spark.createDataFrame([("r1", "a")], "repo string, path string")
    ops = {
        (r["path"]): r["op"]
        for r in classify_events(feed, existing_keys=existing).collect()
    }
    assert ops == {"a": "U", "b": "I"}


def test_classify_into_replay_matches_oracle(spark, tmp_path):
    """Raw status-coded feed -> classify pre-stage -> replay == oracle of
    the op-coded log (the engine treats I and U identically)."""
    log = generate_changelog(spark, 1200, seed=42, n_repos=4, paths_per_repo=10,
                             num_batches=3)
    # strip the op codes, re-express them as reference status codes
    raw = log.withColumn(
        "status", F.when(F.col("op") == "D", "S").otherwise("1")
    ).drop("op")
    eng = ReplayEngine(spark, str(tmp_path / "cl"), num_buckets=4)
    eng.replay(raw, classify={"status_col": "status"})
    got = (
        eng.read_state()
        .select("repo", "path", "commit", "lang", "content", "content_sha256")
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = apply_log_oracle(log.toPandas())
    pd.testing.assert_frame_equal(got, want)
