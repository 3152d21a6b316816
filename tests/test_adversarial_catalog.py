"""Round-5 sweep 7: every catalog entry vs its DuckDB oracle over a
HOSTILE corpus — the sf0.001 tables with every adversarial artifact a
real CDC-fed lake exhibits, stacked into one directory:

- empty / unicode / whitespace-only strings (every 11th/13th/17th)
- zero-length embedding arrays (every 19th)
- exact duplicate rows (every 5th row appended again)
- conflicting-key duplicates (every 5th row re-appended with its key
  intact but every string payload altered — the redelivered-event shape)
- NULLs injected into EVERY column (every 7th value, offset per column)

The one-off sweep over the per-class corpora (dups / key_dups / nulls /
strings / combo, 5 x 49 comparisons) found six real divergences, each
fixed in-engine and exercised by at least one stacked condition here:

1. ngram_jaccard_pairs silently DROPPED true pairs under duplicate
   doc_id rows — the intersection upper-bound prune assumed per-doc
   shingle counts are counted once (n_freq went negative). Fixed by
   canonicalizing to one row per doc_id (MAX(text)) before shingling.
2. cdc_lww_state / incremental_upsert_fold picked an arbitrary copy
   when the same (ts, event_id) was redelivered with a conflicting
   payload — ordering closed into a total order with payload
   tiebreakers (both engines).
3. json_extraction: Spark's JSON parsers accept trailing garbage where
   DuckDB's raise — contract pinned to Spark's documented leniency
   (oracle extracts the leading flat object), plus try_cast for
   non-numeric $.k under ANSI.
4. join_asof lost the as-of value for NULL-purchase_id rows (the
   re-attach equi-join never matches NULL) — re-attach is now null-safe
   on the full grouped triple.
5. frame_sample's Arrow kernel crashed the task on NULL doc_id (NaN in
   a non-nullable int64 output array) — nullable Int64 passthrough.
6. positional_join: Spark bare asc() is NULLS FIRST, DuckDB ASC is
   NULLS LAST — a NULL sort key shifted every later position by one.
   NULL order now pinned NULLS LAST on both engines.
7. similarity entries: a zero-length embedding crashes DuckDB's
   list_dot_product where Spark carries NULL cosines — NULL-or-empty
   vectors now excluded by contract on both engines.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_spark.operators.catalog import CATALOG
from tests.compare import TABLES, duckdb_connection, run_and_compare

UNICODE_SOUP = "Ünïçødé—✓ 名前\tzwíschen"


def _mutate_strings(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    n = len(df)
    for c in df.columns:
        s = df[c]
        if s.dtype != object:
            continue
        sample = s.dropna()
        first = sample.iloc[0] if len(sample) else None
        if isinstance(first, str):
            vals = s.tolist()
            for i in range(n):
                if i % 11 == 0:
                    vals[i] = ""
                elif i % 13 == 0:
                    vals[i] = UNICODE_SOUP
                elif i % 17 == 0:
                    vals[i] = "   "
            df[c] = vals
        elif isinstance(first, (list, np.ndarray)):
            vals = s.tolist()
            for i in range(n):
                if i % 19 == 0:
                    vals[i] = []
            df[c] = vals
    return df


def _mutate_dups(df: pd.DataFrame) -> pd.DataFrame:
    return pd.concat([df, df.iloc[::5]], ignore_index=True)


def _mutate_key_dups(df: pd.DataFrame) -> pd.DataFrame:
    """Same key, conflicting string payload — the redelivered event."""
    extra = df.iloc[::5].copy()
    for c in extra.columns:
        s = extra[c]
        if s.dtype == object and len(s.dropna()) and isinstance(s.dropna().iloc[0], str):
            extra[c] = s.map(lambda v: None if v is None else v + " zzalt")
    return pd.concat([df, extra], ignore_index=True)


def _mutate_nulls(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    n = len(df)
    for ci, c in enumerate(df.columns):
        idx = [i for i in range(n) if (i + ci) % 7 == 0]
        if idx:
            df.loc[df.index[idx], c] = None
    return df


@pytest.fixture(scope="module")
def hostile_dir(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("hostile_sf")
    for t in TABLES:
        src = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        df = src.to_pandas()
        for fn in (_mutate_strings, _mutate_dups, _mutate_key_dups, _mutate_nulls):
            df = fn(df)
        # write with the ORIGINAL arrow schema so column types are
        # byte-identical to the pristine corpus
        pq.write_table(
            pa.Table.from_pandas(df, schema=src.schema, preserve_index=False),
            os.path.join(str(out), f"{t}.parquet"),
        )
    return str(out)


@pytest.fixture(scope="module")
def hostile_con(hostile_dir):
    c = duckdb_connection(hostile_dir)
    yield c
    c.close()


def _mutate_extremes(df: pd.DataFrame) -> pd.DataFrame:
    """Domain-contract boundary values. Ints: 0 / -1 / +-2^61.
    Doubles: money columns |v| <= ~1e9 with 2 decimals, rate columns
    (discount/tax) in [0, 1] — finer or bigger inputs hit genuinely
    different engine internals (Spark rounds the double's decimal
    string HALF_UP where DuckDB scales in double space, so 0.005 ->
    0.01 vs 0.00; sums beyond ~1e13 carry > 53 bits of decimal payload
    so decimal->double conversion differs in the 17th significant
    digit; DuckDB's DECIMAL(18)x(18) multiply overflows at 1e16 where
    Spark widens). Out-of-range money is covered separately by
    test_decimal_overflow_raises_in_both_engines: both engines ABORT,
    by contract, rather than silently null. Timestamps: ns-epoch
    boundaries (the comparison layer is datetime64[ns])."""
    df = df.copy()
    n = len(df)
    for c in df.columns:
        s = df[c]
        st = str(s.dtype)
        if st.startswith("int") and n >= 4:
            vals = s.tolist()
            vals[0], vals[1], vals[2], vals[3] = 0, -1, 2**61, -(2**61)
            df[c] = pd.array(vals, dtype=st)
        elif st.startswith("float") and n >= 6:
            vals = s.tolist()
            if any(k in c for k in ("discount", "tax")):
                vals[:6] = [0.0, 1.0, 0.01, 0.99, 0.5, -0.0]
            else:
                vals[:6] = [999999999.99, -999999999.99, -0.0, 0.01, -0.01, 123456789.45]
            df[c] = vals
        elif st.startswith("datetime") and n >= 4:
            vals = s.tolist()
            vals[0] = pd.Timestamp("1678-01-01 00:00:00.000001")
            vals[1] = pd.Timestamp("2260-12-31 23:59:59.999999")
            vals[2] = pd.Timestamp("1970-01-01 00:00:00")
            vals[3] = pd.Timestamp("1969-12-31 23:59:59.999999")
            df[c] = pd.array(vals).astype("datetime64[us]")
    return df


def _write_corpus(sf_dir, out, mutations) -> str:
    for t in TABLES:
        src = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        df = src.to_pandas()
        for fn in mutations:
            df = fn(df)
        # write with the ORIGINAL arrow schema so column types are
        # byte-identical to the pristine corpus
        pq.write_table(
            pa.Table.from_pandas(df, schema=src.schema, preserve_index=False),
            os.path.join(str(out), f"{t}.parquet"),
        )
    return str(out)


@pytest.fixture(scope="module")
def empty_dir(sf_dir, tmp_path_factory):
    return _write_corpus(
        sf_dir, tmp_path_factory.mktemp("empty_sf"), [lambda df: df.iloc[0:0]]
    )


@pytest.fixture(scope="module")
def extremes_dir(sf_dir, tmp_path_factory):
    return _write_corpus(
        sf_dir, tmp_path_factory.mktemp("extremes_sf"), [_mutate_extremes]
    )


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql])
def test_catalog_entry_on_hostile_corpus(spark, hostile_con, hostile_dir, name):
    builder, sql = CATALOG[name]
    run_and_compare(spark, hostile_con, builder, sql, hostile_dir, f"hostile:{name}")


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql is None])
def test_catalog_entry_on_hostile_corpus_runs(spark, hostile_dir, name):
    """Oracle-less entries must at least survive the hostile corpus."""
    builder, _ = CATALOG[name]
    builder(spark, hostile_dir).count()


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql])
def test_catalog_entry_on_empty_corpus(spark, empty_dir, name):
    """Zero-row tables: both engines must agree (the class that caught
    Spark's ROLLUP dropping the SQL standard's grand-total row)."""
    builder, sql = CATALOG[name]
    con = duckdb_connection(empty_dir)
    try:
        run_and_compare(spark, con, builder, sql, empty_dir, f"empty:{name}")
    finally:
        con.close()


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql])
def test_catalog_entry_on_extremes_corpus(spark, extremes_dir, name):
    """Domain-boundary values (the class that caught the 6-dp rounding
    shortcut losing an ulp near 2^53 in the trend fit)."""
    builder, sql = CATALOG[name]
    con = duckdb_connection(extremes_dir)
    try:
        run_and_compare(spark, con, builder, sql, extremes_dir, f"extremes:{name}")
    finally:
        con.close()


def _library_ops():
    from etl_spark.operators.dedup import DECONTAMINATE_SQL, decontaminate
    from etl_spark.operators.textstats import (
        PII_SCRUB_SQL,
        REPETITION_STATS_SQL,
        pii_scrub,
        repetition_stats,
    )

    return {
        "pii_scrub": (pii_scrub, PII_SCRUB_SQL),
        "repetition_stats": (repetition_stats, REPETITION_STATS_SQL),
        "decontaminate": (decontaminate, DECONTAMINATE_SQL),
    }


@pytest.mark.parametrize("name", ["pii_scrub", "repetition_stats", "decontaminate"])
@pytest.mark.parametrize("corpus", ["hostile", "empty", "extremes"])
def test_library_ops_on_adversarial_corpora(
    spark, hostile_dir, empty_dir, extremes_dir, corpus, name
):
    """The beyond-catalog library stages hold the same oracle discipline
    on every adversarial corpus (one-off sweep also passed dups /
    key_dups / strings / combo per-class corpora)."""
    builder, sql = _library_ops()[name]
    d = {"hostile": hostile_dir, "empty": empty_dir, "extremes": extremes_dir}[corpus]
    con = duckdb_connection(d)
    try:
        run_and_compare(spark, con, builder, sql, d, f"{corpus}:{name}")
    finally:
        con.close()


def test_decimal_overflow_raises_in_both_engines(spark, tmp_path):
    """The loud-failure contract: money outside DECIMAL(18,2) ABORTS in
    BOTH engines (Spark ANSI cast, DuckDB cast) rather than silently
    nulling — a 1e308 'price' is corruption, and one engine degrading
    to NULL while the other errors would be the worst of both worlds."""
    import duckdb
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"v": [1.0, 1e308]})
    pdf.to_parquet(tmp_path / "t.parquet", index=False)

    sdf = spark.read.parquet(str(tmp_path / "t.parquet"))
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|Decimal"):
        sdf.select(F.col("v").cast("decimal(18,2)").alias("d")).agg(
            F.sum("d")
        ).collect()

    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.ConversionException):
            con.execute(
                f"SELECT SUM(CAST(v AS DECIMAL(18,2))) FROM '{tmp_path}/t.parquet'"
            ).fetchall()
    finally:
        con.close()
