"""Regression tests for the round-5 source/CLI review closures:

1. `read_csv_pruned` yields NULL (not a job abort) for empty/unparseable
   date cells under Spark 4's default ANSI mode.
2. `read_csv_repaired` gives a clear error when the schema-bearing first
   file is empty, instead of a NoneType subscript crash.
3. `read_table` fills in only the MISSING partition bound — a
   caller-supplied bound is a deliberate planning restriction.
4. `discover_files` / `latest_file` see zero-row files (real directory
   listing, not per-row metadata), and an empty glob errors clearly.
5. `read_xml_rows(corrupt_col=...)` preserves rows whose document is
   malformed, flagged, instead of silently dropping them.
6. CLI inspection commands attach to EXISTING tables (no silent
   empty-table creation at a typo'd path; recorded mode respected).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from etl_spark.sources.csv import read_csv_pruned, read_csv_repaired
from etl_spark.sources.discovery import discover_files, latest_file, read_latest
from etl_spark.sources.xml import read_xml_rows


def test_csv_pruned_empty_date_cell_is_null_not_error(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("a;dt\nx;2024-01-02\ny;\nz;not-a-date\n")
    df = read_csv_pruned(spark, str(p), ["a", "dt"], date_columns={"dt": "yyyy-MM-dd"})
    got = {r["a"]: r["dt"] for r in df.collect()}
    assert str(got["x"]) == "2024-01-02"
    assert got["y"] is None and got["z"] is None


def test_csv_repaired_empty_first_file_errors_clearly(spark, tmp_path):
    empty = tmp_path / "empty.csv"
    empty.write_text("")
    with pytest.raises(ValueError, match="no header line"):
        read_csv_repaired(spark, str(empty))


def test_jdbc_probe_fills_only_missing_bound(spark, monkeypatch):
    import etl_spark.sources.jdbc as J

    captured = {}

    class _FakeReader:
        def option(self, k, v):
            captured[k] = v
            return self

        def load(self):
            return "sentinel"

    monkeypatch.setattr(J, "_base_reader", lambda *a, **k: _FakeReader())
    monkeypatch.setattr(
        J, "read_query",
        lambda *a, **k: type("R", (), {"first": staticmethod(
            lambda: {"lo": 1, "hi": 100})})(),
    )
    J.read_table(spark, "jdbc:fake", "t", partition_column="id", lower_bound=50)
    # the caller's lower bound survives; only the missing upper is probed
    assert captured["lowerBound"] == "50"
    assert captured["upperBound"] == "100"


def test_latest_file_sees_zero_row_newest_file(spark, tmp_path, sf_dir):
    old = tmp_path / "drop_old.parquet"
    shutil.copy(f"{sf_dir}/region.parquet", old)
    # newest export is EMPTY (zero rows): per-row metadata never sees it
    src = tmp_path / "zero_src"
    spark.read.parquet(f"{sf_dir}/region.parquet").limit(0).coalesce(1).write.parquet(str(src))
    part = next(p for p in os.listdir(src) if p.startswith("part-"))
    newest = tmp_path / "drop_new.parquet"
    shutil.copy(src / part, newest)
    now = time.time()
    os.utime(old, (now - 100, now - 100))
    os.utime(newest, (now, now))

    pattern = str(tmp_path / "drop_*.parquet")
    assert discover_files(spark, pattern).count() == 2
    assert latest_file(spark, pattern).endswith("drop_new.parquet")
    assert read_latest(spark, pattern).count() == 0

    with pytest.raises(FileNotFoundError, match="no files match"):
        latest_file(spark, str(tmp_path / "nothing_*.parquet"))


def test_xml_corrupt_rows_kept_when_flagged(spark):
    rows = [
        ("k1", "<r><rec><a>1</a></rec></r>"),
        ("k2", "<r><rec><a>2</a></rec><rec><a>3</a></rec></r>"),
        ("k3", "<r><rec><a>4</a>"),  # truncated: malformed
    ]
    df = spark.createDataFrame(rows, "id string, doc string")
    # default: the malformed row vanishes (documented)
    plain = read_xml_rows(df, "doc", "rec", "a string")
    assert {r["id"] for r in plain.collect()} == {"k1", "k2"}
    # flagged: the malformed row survives with null fields + the flag
    kept = read_xml_rows(df, "doc", "rec", "a string", corrupt_col="_corrupt")
    by_id = {}
    for r in kept.collect():
        by_id.setdefault(r["id"], []).append((r["a"], r["_corrupt"]))
    assert sorted(by_id["k2"]) == [("2", False), ("3", False)]
    assert by_id["k3"] == [(None, True)]
    assert by_id["k1"] == [("1", False)]


def test_cli_state_refuses_missing_table(spark, tmp_path, capsys):
    from etl_spark.cli import main

    missing = str(tmp_path / "typo_path")
    with pytest.raises(ValueError, match="no table at"):
        main(["state", "--table", missing])
    # and it did NOT create an empty table at the typo'd path
    assert not os.path.exists(missing)


def test_cli_mode_hint_refused_on_conflict(spark, tmp_path):
    """--mode on attach commands is a refused-on-conflict hint, never
    silently dropped; omitting it opens the recorded mode."""
    from etl_spark.cdc.replay import ReplayEngine
    from etl_spark.cli import main

    root = str(tmp_path / "cow_table")
    ReplayEngine(spark, root, num_buckets=4, mode="cow")
    with pytest.raises(ValueError, match="conflicts"):
        main(["state", "--table", root, "--mode", "mor"])
    assert main(["state", "--table", root]) == 0
    assert main(["state", "--table", root, "--mode", "cow"]) == 0


def test_xml_corrupt_col_collision_refused(spark):
    df = spark.createDataFrame([("k1", "<r><rec><a>1</a></rec></r>")], "id string, doc string")
    with pytest.raises(ValueError, match="collides"):
        read_xml_rows(df, "doc", "rec", "a string", corrupt_col="id")
