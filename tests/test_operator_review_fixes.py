"""Regression tests for the round-5 operator review closures:

1. `_shingles` honors its `n` parameter (grams were hardcoded to three
   tokens regardless of the requested width).
2. `connected_components(algorithm="auto")` gives the star-contraction
   RESCUE its own diameter-independent round budget instead of reusing
   the caller's propagation bound.
3. `grouped._round6` rounds half away from zero (SQL ROUND semantics);
   Python's banker's round diverged from the DuckDB oracle on exact
   dyadic ties.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_spark.operators.dedup import _shingles
from etl_spark.operators.graph import connected_components
from etl_spark.operators.grouped import _round6


@pytest.mark.parametrize(
    "n,want",
    [
        (2, ["a b", "b c", "c d"]),
        (3, ["a b c", "b c d"]),
        (4, ["a b c d"]),
        (5, []),  # shorter than n tokens -> empty
    ],
)
def test_shingles_honor_n(spark, n, want):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(_shingles(F.col("text"), n=n).alias("sh")).first()["sh"]
    assert got == want


def test_auto_fallback_gets_its_own_round_budget(spark):
    """A 12-vertex chain with max_rounds=1: propagation cannot converge
    in one round, and a star contraction capped at the same single
    round cannot finish either — the fallback must run under its own
    MAX_STAR_ROUNDS default and return the correct single component."""
    edges = [(i, i + 1) for i in range(11)]
    pairs = spark.createDataFrame(edges, "u long, v long")
    labels = connected_components(pairs, "u", "v", algorithm="auto", max_rounds=1)
    rows = labels.collect()
    assert len(rows) == 12
    assert {r["component"] for r in rows} == {0}


def test_round6_matches_sql_round_on_ties():
    con = duckdb.connect()
    # the last two pin the large-magnitude regime where |v|*1e6 exceeds
    # 2**53: the old floor(|v|*1e6 + 0.5) shortcut drifted an ulp there
    for v in [0.0078125, -0.0078125, 0.1234565, 2.5e-6, 0.9999995, 1.25,
              -6451612911.2326765, 13515531600.005375]:
        want = con.execute("SELECT ROUND(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
        assert _round6(v) == want, v
    # the divergence this guards against: banker's rounding goes to even
    assert round(0.0078125, 6) != _round6(0.0078125)
