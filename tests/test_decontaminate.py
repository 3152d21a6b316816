"""Benchmark decontamination vs the DuckDB twin (library operator; same
oracle discipline as the catalog)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_spark.operators.dedup import DECONTAMINATE_SQL, decontaminate
from tests.compare import compare_frames

EVAL_Q = "what is the capital of atlantis and why is it submerged below the sea"


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """doc_id 0/50/100 are the eval set (id % 50 == 0). Training docs:
    149 quotes one eval question verbatim inside unrelated prose
    (contaminated), 151 shares exactly two 3-grams (below the
    threshold of 3), 152 is clean."""
    out = tmp_path_factory.mktemp("decon")
    docs = {
        0: EVAL_Q,
        50: "name three primary colors in classical painting theory today",
        100: "completely unrelated benchmark question about rivers",
        149: "intro text here. " + EVAL_Q + " outro text follows with more words",
        151: "what is the capital city of somewhere else entirely",
        152: "a perfectly clean training document about gardening tools",
    }
    ids = sorted(docs)
    pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "text": [docs[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["t"] * len(ids),
            "n_chars": pd.array([len(docs[i]) for i in ids], dtype="int64"),
        }
    ).to_parquet(out / "documents.parquet", index=False)
    return str(out)


def test_decontaminate_matches_oracle(spark, corpus_dir):
    got = decontaminate(spark, corpus_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{corpus_dir}/documents.parquet'"
        )
        want = con.execute(DECONTAMINATE_SQL).fetch_df()
    finally:
        con.close()
    compare_frames(got, want, "decontaminate")


def test_decontaminate_flags_the_quoting_doc(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in decontaminate(spark, corpus_dir).collect()}
    assert set(rows) == {149, 151, 152}  # eval ids excluded from output
    assert rows[149]["contaminated"] and rows[149]["n_shared"] >= 10
    assert not rows[151]["contaminated"] and 1 <= rows[151]["n_shared"] <= 2
    assert not rows[152]["contaminated"] and rows[152]["n_shared"] == 0


def test_decontaminate_explicit_eval_frame(spark, corpus_dir):
    """A caller-supplied eval frame scans ALL documents as training."""
    eval_docs = spark.createDataFrame([(1, EVAL_Q)], "eval_id long, text string")
    rows = {
        r["doc_id"]: r
        for r in decontaminate(spark, corpus_dir, eval_docs=eval_docs).collect()
    }
    # doc 0 IS the eval question verbatim -> maximally contaminated;
    # 149 quotes it; everything else is clean of THIS eval set
    assert rows[0]["contaminated"] and rows[149]["contaminated"]
    assert not rows[151]["contaminated"] and not rows[152]["contaminated"]


def test_decontaminate_matches_oracle_on_driver_table(spark, sf_dir):
    got = decontaminate(spark, sf_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = con.execute(DECONTAMINATE_SQL).fetch_df()
    finally:
        con.close()
    compare_frames(got, want, "decontaminate@sf")
    assert len(got) > 0
