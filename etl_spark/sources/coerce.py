"""Schema inference / dynamic coercion for string-typed ingests
(SURVEY.md C13 / F15; reference ``src/jobs/indkoebsdata.py:137-147``).

The reference loops over columns trying datetime-then-numeric casts in
pandas. Spark-native: ONE aggregation computes, per candidate column,
how many non-null values survive ``try_cast`` to each target type; the
winning cast plan is then applied declaratively. Two jobs total
regardless of column count — no per-column passes, no sampling bias
(the whole column votes).

Decision rule (deterministic):
  all non-nulls parse as BIGINT      -> bigint
  else all parse as DOUBLE           -> double  (',' decimal normalized)
  else all parse as DATE yyyy-MM-dd  -> date
  else all parse as TIMESTAMP        -> timestamp
  else                               -> keep string
Empty strings count as nulls for voting and are nulled in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CANDIDATES = ["bigint", "double", "date", "timestamp_ntz"]


def _clean(c):
    s = F.trim(F.col(c))
    return F.when(s == "", None).otherwise(s)


def _norm_decimal(col):
    return F.replace(col, F.lit(","), F.lit("."))


def _try(col, typ):
    if typ == "double":
        return _norm_decimal(col).try_cast("double")
    if typ == "date":
        # bare dates only — a timestamp string would cast to date too
        # (silently truncating); require the 10-char yyyy-MM-dd shape
        return F.when(F.length(col) == 10, col.try_cast("date"))
    return col.try_cast(typ)


def infer_cast_plan(
    df: DataFrame, columns: list[str] | None = None, sample_fraction: float | None = None
) -> dict[str, str]:
    """One aggregation pass -> {column: winning_type}.

    ``sample_fraction``: at 100 TB a whole-column vote is a full scan
    with 4 parse attempts per cell; a deterministic-seed sample (e.g.
    0.001) bounds the inference pass while the WINNING cast still
    try_casts every row (a value the sample missed degrades to null,
    never to a wrong value — same failure mode as the reference's
    try/except loop). Default None = exact vote (sandbox scale)."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=42)
    cols = [c for c in (columns or df.columns) if dict(df.dtypes)[c] == "string"]
    if not cols:
        return {}
    aggs = []
    for c in cols:
        v = _clean(c)
        aggs.append(F.count(v).alias(f"{c}__n"))
        for typ in _CANDIDATES:
            aggs.append(F.count(_try(v, typ)).alias(f"{c}__{typ}"))
    row = df.agg(*aggs).first()
    plan: dict[str, str] = {}
    for c in cols:
        n = row[f"{c}__n"]
        chosen = "string"
        if n > 0:
            for typ in _CANDIDATES:
                if row[f"{c}__{typ}"] == n:
                    chosen = typ
                    break
        plan[c] = chosen
    return plan


def coerce_string_columns(
    df: DataFrame, columns: list[str] | None = None, sample_fraction: float | None = None
) -> DataFrame:
    """Apply the inferred cast plan (explicit, logged in the plan itself —
    ``df.schema`` after this call IS the coercion record).

    Cleaning contract: EVERY covered column — including those the vote
    keeps as string — is trimmed of leading/trailing whitespace with
    empty strings nulled (``_clean``). That is a deliberate part of the
    rule (the DuckDB oracle mirrors it), not an inference side effect:
    callers whose string columns carry meaningful edge whitespace
    (verbatim source code, fixed-width payloads) should exclude them
    via ``columns=``."""
    plan = infer_cast_plan(df, columns, sample_fraction)
    out = df
    for c, typ in plan.items():
        v = _clean(c)
        if typ == "string":
            out = out.withColumn(c, v)
        else:
            out = out.withColumn(c, _try(v, typ))
    return out


# ---------------------------------------------------------------- catalog entry
def schema_coercion(spark, sf_dir: str):
    """Catalog entry: string-ify events columns, then let the inference
    vote restore the types (C13 round-trip — proves the coercion rule
    lands on bigint/timestamp/double/string exactly)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("ts").cast("string").alias("ts"),
        F.col("value").cast("string").alias("value"),
        F.col("event_type"),
    )
    return coerce_string_columns(e)


SCHEMA_COERCION_SQL = """
SELECT TRY_CAST(NULLIF(TRIM(CAST(event_id AS VARCHAR)), '') AS BIGINT) AS event_id,
       TRY_CAST(NULLIF(TRIM(CAST(ts AS VARCHAR)), '') AS TIMESTAMP) AS ts,
       TRY_CAST(REPLACE(NULLIF(TRIM(CAST(value AS VARCHAR)), ''), ',', '.') AS DOUBLE) AS value,
       NULLIF(TRIM(event_type), '') AS event_type
FROM events
"""
