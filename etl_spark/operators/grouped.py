"""Grouped-map pandas UDF operators (SURVEY.md §2.9 D5).

The reference fits a Prophet model per queue inside a driver loop
(``src/jobs/frontdesk_borgerservice.py:217-264``, loop ``:48-59``). The
Spark-native shape is ``groupBy(...).applyInPandas(fit, schema)``: the
model fit runs on executors, one Arrow batch per group, no driver loop
and no per-row Python.

Determinism contract (so the DuckDB oracle can hash-match): the fit is
an ordinary least-squares trend computed from *integer-exact* sums
(days and value-cents are int64, so Sx/Sy/Sxy/Sxx are exact in both
engines); slope and intercept are then single exact-int divisions in
float64 — bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TREND_SCHEMA = "event_type string, n_days long, slope double, intercept double"


def _round6(v: float | None) -> float | None:
    """ROUND-half-away-from-zero at 6 dp of the double's SHORTEST
    DECIMAL REPR — the semantics both engines implement (Spark's Round
    goes through BigDecimal.valueOf = Double.toString; DuckDB matches):
    0.1234565 reads as the tie "...565" and rounds UP to 0.123457 even
    though its exact binary expansion is ...56499..., while a true
    dyadic tie like 2**-7 = 0.0078125 also rounds up (Python's builtin
    round() is banker's and would go to even — hash divergence). The
    floor(|v|*1e6 + 0.5) shortcut this replaces agreed on small values
    but lost an ulp once |v|*1e6 neared 2**53 (a slope of
    -6451612911.2326765 rounded to ...678 where both engines say
    ...677). Decimal(repr(v)) is the shortest repr at any magnitude.
    None (SQL NULL) and non-finite values pass through."""
    if v is None or v != v or v in (float("inf"), float("-inf")):
        return v
    return float(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _fit_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """OLS of daily total value (cents) on day-of-month, closed form over
    exact integer sums. Runs once per group on an executor."""
    # Python-int sums, not pandas .sum(): numpy int64 arithmetic WRAPS
    # silently on overflow while the oracle's SUM promotes to HUGEINT —
    # day*cents products near 2^63 would hash-diverge. The group is at
    # most 31 rows (one per day-of-month after the daily aggregation),
    # so exact arbitrary-precision sums cost nothing.
    xs = [int(v) for v in pdf["day"]]
    ys = [int(v) for v in pdf["cents"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    denom = n * sxx - sx * sx
    if denom == 0:
        # SQL NULL, not NaN: a single-distinct-day group divides by
        # zero, which DuckDB (and any SQL oracle) evaluates to NULL —
        # emitting NaN here would hash-diverge from the oracle on an
        # otherwise-correct result
        slope = None
        intercept = None
    else:
        slope = (n * sxy - sx * sy) / (denom * 100.0)
        intercept = (sy * sxx - sx * sxy) / (denom * 100.0)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [n],
            # object dtype so None survives Arrow conversion as a null
            # (a float64 column would coerce it back to NaN)
            "slope": pd.Series([_round6(slope)], dtype="object"),
            "intercept": pd.Series([_round6(intercept)], dtype="object"),
        }
    )


def grouped_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: linear trend of daily total value over day-of-month,
    fitted group-wise with applyInPandas (reference D5 re-expressed)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupBy(
            "event_type",
            F.dayofmonth("ts").cast("long").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("cents"))
        # a NULL day (NULL ts) or NULL cents (all-NULL values) carries no
        # (x, y) observation for the fit — and int64-casting it would
        # crash the Arrow kernel; the oracle applies the identical filter
        .filter(F.col("day").isNotNull() & F.col("cents").isNotNull())
    )
    return daily.groupBy("event_type").applyInPandas(_fit_trend, TREND_SCHEMA)


GROUPED_LINEAR_TREND_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(DAYOFMONTH(ts) AS BIGINT) AS day,
         SUM(CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
daily2 AS (
  SELECT * FROM daily WHERE day IS NOT NULL AND cents IS NOT NULL
),
sums AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(day) AS sx, SUM(cents) AS sy,
         SUM(day * cents) AS sxy, SUM(day * day) AS sxx
  FROM daily2 GROUP BY 1
)
SELECT event_type, n AS n_days,
       ROUND((n * sxy - sx * sy) / ((n * sxx - sx * sx) * 100.0), 6) AS slope,
       ROUND((sy * sxx - sx * sxy) / ((n * sxx - sx * sx) * 100.0), 6) AS intercept
FROM sums
"""
