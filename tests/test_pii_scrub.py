"""PII scrubbing vs the DuckDB twin on a PII-laden corpus (library
operator beyond the 50-entry driver catalog; same oracle discipline)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_spark.operators.textstats import PII_SCRUB_SQL, pii_scrub
from tests.compare import compare_frames

DOCS = [
    "contact alice.smith+spam@example.co.uk or bob@sub.domain.org today",
    "card 4111 1111 1111 1111 expires soon; alt 4242-4242-4242-4242",
    "server at 192.168.0.1 and 10.0.0.255, not 999.999.999.999.more",
    "call +45 12 34 56 78 or +1 (555) 123-4567 now",
    "mixed: eve@corp.io from 8.8.8.8 card 5500 0000 0000 0004 tel +4912345678",
    "no pii here, just text with numbers 12345 and a lone + sign",
    "",
    "   ",
    "unicode café ønsker: mail støtte@firma.dk fra 172.16.254.3",
]


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("pii")
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


def test_pii_scrub_matches_oracle(spark, pii_dir):
    got = pii_scrub(spark, pii_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{pii_dir}/documents.parquet'"
        )
        want = con.execute(PII_SCRUB_SQL).fetch_df()
    finally:
        con.close()
    compare_frames(got, want, "pii_scrub")


def test_pii_scrub_redacts_and_counts(spark, pii_dir):
    rows = {r["doc_id"]: r for r in pii_scrub(spark, pii_dir).collect()}
    assert rows[0]["n_email"] == 2 and "@" not in rows[0]["text_scrubbed"]
    assert rows[1]["n_card"] == 2 and "<CARD>" in rows[1]["text_scrubbed"]
    assert rows[2]["n_ipv4"] >= 2 and "<IP>" in rows[2]["text_scrubbed"]
    assert rows[3]["n_phone"] == 2 and "<PHONE>" in rows[3]["text_scrubbed"]
    # mixed doc: every class fires once
    r = rows[4]
    assert (r["n_email"], r["n_card"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1, 1)
    for tag in ("<EMAIL>", "<CARD>", "<IP>", "<PHONE>"):
        assert tag in r["text_scrubbed"]
    # clean docs untouched
    assert rows[5]["text_scrubbed"] == DOCS[5]
    assert (rows[5]["n_email"], rows[5]["n_card"], rows[5]["n_ipv4"], rows[5]["n_phone"]) == (0, 0, 0, 0)
    # unicode local parts are out of the documented ASCII scope, but the
    # ASCII tail of the address still redacts; the IP always does
    assert "<IP>" in rows[8]["text_scrubbed"]


def test_pii_scrub_on_driver_table(spark, sf_dir):
    """Runs clean over the driver's documents table (no PII there — all
    counts zero, text unchanged), proving the operator composes with
    the standard corpus."""
    out = pii_scrub(spark, sf_dir)
    agg = out.selectExpr(
        "sum(n_email + n_card + n_ipv4 + n_phone) AS total"
    ).collect()[0]
    assert agg["total"] == 0
