"""Within-document repetition stats vs the DuckDB twin (library
operator; Gopher-style quality family)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_spark.operators.textstats import REPETITION_STATS_SQL, repetition_stats
from tests.compare import compare_frames

DOCS = [
    # 0: menu-spam page — 4 of 6 lines are one repeated row
    "home | nav\nabout us\nhome | nav\nhome | nav\nhome | nav\ncontact",
    # 1: clean multi-line page, no repeats
    "alpha line\nbeta line\ngamma line",
    # 2: newline-free text -> sentence fallback, one repeated sentence
    "buy now. limited offer. buy now. details inside. buy now.",
    # 3: blank-ish page (whitespace lines only)
    "   \n \n",
    # 4: single line
    "just one line",
    "",
]


@pytest.fixture(scope="module")
def rep_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("rep")
    pd.DataFrame(
        {
            "doc_id": pd.array(range(len(DOCS)), dtype="int64"),
            "text": DOCS,
            "lang": ["en"] * len(DOCS),
            "source": ["t"] * len(DOCS),
            "n_chars": pd.array([len(d) for d in DOCS], dtype="int64"),
        }
    ).to_parquet(out / "documents.parquet", index=False)
    return str(out)


def test_repetition_stats_matches_oracle(spark, rep_dir):
    got = repetition_stats(spark, rep_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{rep_dir}/documents.parquet'"
        )
        want = con.execute(REPETITION_STATS_SQL).fetch_df()
    finally:
        con.close()
    compare_frames(got, want, "repetition_stats")


def test_repetition_values(spark, rep_dir):
    rows = {r["doc_id"]: r for r in repetition_stats(spark, rep_dir).collect()}
    # menu spam: 6 lines, 3 distinct -> dup fraction 0.5, top line x4
    assert rows[0]["n_lines"] == 6 and rows[0]["max_line_freq"] == 4
    assert rows[0]["dup_line_fraction"] == 0.5
    # clean page: nothing repeats
    assert rows[1]["dup_line_fraction"] == 0.0 and rows[1]["max_line_freq"] == 1
    assert rows[1]["distinct_line_ratio"] == 1.0
    # sentence fallback: "buy now" x3 of 5 sentences
    assert rows[2]["n_lines"] == 5 and rows[2]["max_line_freq"] == 3
    # degenerate pages: zero lines, zero ratios, no NULLs
    for i in (3, 5):
        assert rows[i]["n_lines"] == 0 and rows[i]["max_line_freq"] == 0
        assert rows[i]["dup_line_fraction"] == 0.0
    assert rows[4]["n_lines"] == 1 and rows[4]["max_line_freq"] == 1


def test_repetition_stats_matches_oracle_on_driver_table(spark, sf_dir):
    got = repetition_stats(spark, sf_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = con.execute(REPETITION_STATS_SQL).fetch_df()
    finally:
        con.close()
    compare_frames(got, want, "repetition_stats@sf")
    assert len(got) > 0
