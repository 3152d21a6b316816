"""Tolerance verification for the one no-oracle catalog entry
(VERDICT r02 #5): `approx_distinct_users` has no DuckDB twin by
construction (different sketch), so it is verified here against the
exact-distinct machinery instead: per group,
|HLL++ estimate - exact| <= 3 * rsd * exact at sf0.01 — three standard
deviations of the sketch's guaranteed relative standard deviation."""

from __future__ import annotations

from etl_spark.operators.relational import approx_distinct_users, distinct_count

RSD = 0.01  # must match the operator's rsd argument


def test_approx_distinct_within_tolerance(spark):
    sf_dir = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r["n_users"] for r in distinct_count(spark, sf_dir).collect()}
    approx = {r["event_type"]: r["approx_users"] for r in approx_distinct_users(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for g, n in exact.items():
        assert abs(approx[g] - n) <= max(1, 3 * RSD * n), (
            f"group {g}: approx {approx[g]} vs exact {n} outside 3*rsd tolerance"
        )
