"""Regression tests for the fourth round-5 review sweep (operator NULL
semantics + engine-portable regexes + streaming carry ordering):

1. Stream-replay carry subdirs must order NUMERICALLY by epoch — a
   lexicographic sort puts ``v=10`` before ``v=9``, so at every epoch
   digit boundary the deferred-deletion protocol (``prior[:-1]``) would
   delete the NEWEST carry (the open batch's only durable copy).
2. The three multimodal Arrow kernels must be NULL-payload safe and
   stay oracle-parity on a corpus containing a NULL text document
   (``F.encode(NULL)`` is NULL; ``len(None)`` used to crash the task).
3. ``grouped_linear_trend`` emits SQL NULL — not NaN — for a
   single-distinct-day group (denominator 0), matching the oracle's
   divide-by-zero-is-NULL semantics.
4. ``token_count`` / ``doc_fingerprint`` use an explicit whitespace
   class: Java's ``\\s`` includes vertical tab ``\\x0B`` but DuckDB's
   RE2 ``\\s`` does not, so a bare ``\\s`` hash-diverges on text
   containing ``\\x0B``.
5. ``schema_coercion`` nulls whitespace-only strings in EVERY covered
   column (including ones the vote keeps as string), and the oracle
   mirrors it.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_spark.operators.grouped import (
    GROUPED_LINEAR_TREND_SQL,
    _fit_trend,
    _round6,
    grouped_linear_trend,
)
from etl_spark.operators.multimodal import (
    BINARY_PAYLOAD_STATS_SQL,
    FRAME_SAMPLE_SQL,
    IMAGE_DECODE_RESIZE_SQL,
    binary_payload_stats,
    frame_sample,
    image_decode_resize,
)
from etl_spark.operators.textstats import (
    DOC_FINGERPRINT_SQL,
    TOKEN_COUNT_SQL,
    doc_fingerprint,
    token_count,
)
from etl_spark.sources.coerce import SCHEMA_COERCION_SQL, schema_coercion
from etl_spark.streaming.stream_replay import _ordered_carry_versions
from tests.compare import run_and_compare


def _oracle(dir_: str, *tables: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{dir_}/{t}.parquet'")
    return con


# ---------------------------------------------------------------- 1. carry order
def test_carry_versions_order_numerically():
    names = ["v=10", "v=9", "v=2", "v=11", "other", "_spark_metadata"]
    assert _ordered_carry_versions(names) == ["v=2", "v=9", "v=10", "v=11"]
    # the filter is strict-less-than: a redelivered epoch must not read
    # its own half-written carry
    assert _ordered_carry_versions(names, before_epoch=11) == ["v=2", "v=9", "v=10"]
    assert _ordered_carry_versions(names, before_epoch=2) == []


def test_carry_digit_boundary_keeps_newest():
    # the exact failure shape: at epoch 11 the survivors are v=9 and
    # v=10; prior[:-1] deletion must drop v=9 and KEEP v=10 (the open
    # batch's only durable copy). Lexicographic order would invert it.
    prior = _ordered_carry_versions(["v=9", "v=10"], before_epoch=11)
    assert prior[:-1] == ["v=9"]
    assert prior[-1] == "v=10"


# ---------------------------------------------------------------- 2. NULL payload
@pytest.fixture(scope="module")
def null_doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldocs")
    pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "text": [
                "x" * 900,          # 14 frames -> samples idx 0 and 10
                None,               # the regression: NULL payload
                "æøå multibyte",    # byte_len != char_len
                "",                 # empty-but-not-null payload
            ],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_binary_payload_stats_null_safe(spark, null_doc_dir):
    con = _oracle(null_doc_dir, "documents")
    n = run_and_compare(
        spark, con, binary_payload_stats, BINARY_PAYLOAD_STATS_SQL,
        null_doc_dir, "binary_payload_stats/null",
    )
    assert n == 4  # NULL row survives with NULL features, not a crash
    con.close()


def test_image_decode_resize_null_safe(spark, null_doc_dir):
    con = _oracle(null_doc_dir, "documents")
    n = run_and_compare(
        spark, con, image_decode_resize, IMAGE_DECODE_RESIZE_SQL,
        null_doc_dir, "image_decode_resize/null",
    )
    assert n == 4
    con.close()


def test_frame_sample_null_safe(spark, null_doc_dir):
    con = _oracle(null_doc_dir, "documents")
    n = run_and_compare(
        spark, con, frame_sample, FRAME_SAMPLE_SQL,
        null_doc_dir, "frame_sample/null",
    )
    # only doc 1 has >= FRAME_BYTES bytes; NULL and short docs emit no
    # frames on either engine
    assert n == 2
    con.close()


# ---------------------------------------------------------------- 3. NULL trend
def test_round6_passes_none_through():
    assert _round6(None) is None
    assert _round6(0.0078125) == 0.007813  # half-away-from-zero, not banker's


def test_fit_trend_single_day_is_null_not_nan():
    out = _fit_trend(
        pd.DataFrame({"event_type": ["a", "a"], "day": [5, 5], "cents": [100, 200]})
    )
    assert out["slope"].iloc[0] is None
    assert out["intercept"].iloc[0] is None


@pytest.fixture(scope="module")
def trend_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trendevents")
    pd.DataFrame(
        {
            "event_id": pd.array(range(5), dtype="int64"),
            "ts": pd.to_datetime(
                # 'single' has one distinct day-of-month -> denom 0
                ["2024-03-05", "2024-03-05", "2024-03-01", "2024-03-02", "2024-03-03"]
            ).astype("datetime64[us]"),  # Spark rejects parquet NANOS
            "event_type": ["single", "single", "multi", "multi", "multi"],
            "value": [1.5, 2.25, 10.0, 20.0, 30.0],
        }
    ).to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_grouped_trend_null_slope_matches_oracle(spark, trend_events_dir):
    con = _oracle(trend_events_dir, "events")
    n = run_and_compare(
        spark, con, grouped_linear_trend, GROUPED_LINEAR_TREND_SQL,
        trend_events_dir, "grouped_linear_trend/null",
    )
    assert n == 2
    got = {
        r["event_type"]: r for r in grouped_linear_trend(spark, trend_events_dir).collect()
    }
    assert got["single"]["slope"] is None and got["single"]["intercept"] is None
    assert got["multi"]["slope"] is not None
    con.close()


# ---------------------------------------------------------------- 4. \x0B parity
@pytest.fixture(scope="module")
def vt_doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vtdocs")
    pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3], dtype="int64"),
            "text": [
                "alpha\x0bbeta gamma",      # the divergence trigger
                "tab\tand\fform\rfeeds\n",  # the rest of the class
                " plain words only ",
            ],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_token_count_vertical_tab_parity(spark, vt_doc_dir):
    con = _oracle(vt_doc_dir, "documents")
    run_and_compare(
        spark, con, token_count, TOKEN_COUNT_SQL, vt_doc_dir, "token_count/vt",
    )
    # \x0B must COUNT as whitespace (it separates words in every
    # tokenizer that matters), not merely match between engines
    got = {r["doc_id"]: r["ws_tokens"] for r in token_count(spark, vt_doc_dir).collect()}
    assert got[1] == 3
    con.close()


def test_doc_fingerprint_vertical_tab_parity(spark, vt_doc_dir):
    con = _oracle(vt_doc_dir, "documents")
    run_and_compare(
        spark, con, doc_fingerprint, DOC_FINGERPRINT_SQL, vt_doc_dir, "doc_fingerprint/vt",
    )
    con.close()


# ---------------------------------------------------------------- 5. coercion nulls
@pytest.fixture(scope="module")
def coerce_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("coerceevents")
    pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3], dtype="int64"),
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", None, "2024-01-03 12:30:00"]
            ).astype("datetime64[us]"),
            "value": [1.5, None, 2.25],
            # whitespace-only and empty strings must null out in the
            # kept-as-string column too
            "event_type": ["click", "  ", ""],
        }
    ).to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_schema_coercion_nulls_blank_strings(spark, coerce_events_dir):
    con = _oracle(coerce_events_dir, "events")
    n = run_and_compare(
        spark, con, schema_coercion, SCHEMA_COERCION_SQL,
        coerce_events_dir, "schema_coercion/blanks",
    )
    assert n == 3
    types = dict(schema_coercion(spark, coerce_events_dir).dtypes)
    assert types["event_id"] == "bigint"
    assert types["value"] == "double"
    assert types["event_type"] == "string"
    blanks = (
        schema_coercion(spark, coerce_events_dir)
        .filter("event_id > 1").select("event_type").collect()
    )
    assert all(r["event_type"] is None for r in blanks)
    con.close()
