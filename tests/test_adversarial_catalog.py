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


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql])
def test_catalog_entry_on_hostile_corpus(spark, hostile_con, hostile_dir, name):
    builder, sql = CATALOG[name]
    run_and_compare(spark, hostile_con, builder, sql, hostile_dir, f"hostile:{name}")


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql is None])
def test_catalog_entry_on_hostile_corpus_runs(spark, hostile_dir, name):
    """Oracle-less entries must at least survive the hostile corpus."""
    builder, _ = CATALOG[name]
    builder(spark, hostile_dir).count()
