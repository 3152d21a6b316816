"""Regression tests for the second round-5 review sweep (session/plans/
table/functions surface):

1. `build_session` must not override a spark-submit-provided master or
   set JVM-launch-time confs when the driver JVM already exists — the
   launch-path signal is PYSPARK_GATEWAY_PORT (spark-submit exports it;
   nothing exports SPARK_SUBMIT).
2. `build_merge_plan` handles configs whose right-side join key NAME
   already exists in the running frame (self-joins, re-joined tables):
   the right copy is dropped post-join (USING semantics) so downstream
   by-name references resolve.
3. Footer stats distinguish unknown null counts from zero.
4. `ensure_table` validates key_columns eagerly on the EXISTS path.
"""

from __future__ import annotations

import pytest

from etl_spark.plans.config_plan import build_merge_plan
from etl_spark.session import _external_jvm
from etl_spark.table.stats import _merge_col


def test_external_jvm_signal():
    assert _external_jvm({"PYSPARK_GATEWAY_PORT": "43210"})
    # spark-submit sets no SPARK_SUBMIT-style marker — absence of the
    # gateway port is the only "we own the JVM launch" state
    assert not _external_jvm({})
    assert not _external_jvm({"SPARK_SUBMIT": "1", "SPARK_MASTER": "yarn"})


def test_config_plan_self_join_dedups_key_columns(spark, sf_dir):
    cfg = {
        "base": "orders",
        "joins": [
            {"table": "orders", "on": [["o_custkey", "o_custkey"]], "how": "inner",
             "select": ["o_custkey", "o_totalprice"]},
        ],
        "group_by": ["o_custkey"],
        # the collided non-key right column is addressable via the
        # deterministic pandas-merge-style suffix
        "aggs": [{"fn": "count", "col": "o_totalprice_r", "as": "n"}],
    }
    df = build_merge_plan(spark, sf_dir, cfg)
    assert len(df.columns) == len(set(df.columns))
    got = {r["o_custkey"]: r["n"] for r in df.collect()}
    # oracle: per-customer order count k joins itself into k*k pairs
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r["o_custkey"]: r["k"] * r["k"]
        for r in base.groupBy("o_custkey").count().withColumnRenamed("count", "k").collect()
    }
    assert got == want


def test_config_plan_rejoined_table_keeps_unique_names(spark, sf_dir):
    cfg = {
        "base": "customer",
        "joins": [
            {"table": "orders", "on": [["c_custkey", "o_custkey"]], "how": "left",
             "select": ["o_custkey", "o_totalprice"]},
            {"table": "orders", "on": [["o_custkey", "o_custkey"]], "how": "left",
             "select": ["o_custkey", "o_orderkey"]},
        ],
    }
    df = build_merge_plan(spark, sf_dir, cfg)
    assert len(df.columns) == len(set(df.columns))
    assert df.columns.count("o_custkey") == 1


class _FakeStats:
    def __init__(self, null_count, has_null_count=True, lo=1, hi=9, num_values=5):
        self.null_count = null_count
        self.has_null_count = has_null_count
        self.has_min_max = True
        self.min, self.max = lo, hi
        self.num_values = num_values


def test_footer_stats_unknown_null_count_is_not_zero():
    acc: dict = {}
    _merge_col(acc, "c", _FakeStats(3))
    _merge_col(acc, "c", _FakeStats(None, has_null_count=False))
    assert acc["c"]["nulls"] == 3
    assert acc["c"].get("nulls_unknown") is True
    # bounds stay usable — only the null count is marked unknown
    assert acc["c"]["min"] == 1 and acc["c"]["max"] == 9
    assert not acc["c"].get("unknown")


def test_ensure_table_refuses_mismatched_keys(spark, tmp_path):
    from etl_spark.table.sinks import ensure_table

    root = str(tmp_path / "t")
    cols = [(1, "repo", "string"), (2, "path", "string"), (3, "v", "long")]
    ensure_table(spark, root, cols, key_columns=["repo", "path"], num_buckets=4)
    with pytest.raises(ValueError, match="key_columns"):
        ensure_table(spark, root, cols, key_columns=["repo"], num_buckets=4)
    # matching definition re-opens fine
    assert ensure_table(spark, root, cols, key_columns=["repo", "path"]).key_columns == [
        "repo", "path",
    ]
