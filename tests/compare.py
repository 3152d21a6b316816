"""Driver-contract comparison harness: Spark query vs DuckDB oracle.

Mimics the driver's check: row count + schema + order-insensitive value
comparison with columns sorted by name. Values are canonicalized (Decimal
-> string at its scale, floats kept as float64, timestamps naive UTC) so
only genuine semantic differences fail.
"""

from __future__ import annotations

import decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            sample = s.dropna()
            first = sample.iloc[0] if len(sample) else None
            if isinstance(first, decimal.Decimal):
                df[c] = s.astype("float64")
            elif isinstance(first, (list, np.ndarray)):
                df[c] = s.map(lambda v: None if v is None else tuple(np.asarray(v).tolist()))
            elif isinstance(first, datetime.date) and not isinstance(first, datetime.datetime):
                df[c] = pd.to_datetime(s)
        elif str(s.dtype).startswith(("int", "Int", "uint", "UInt", "float")):
            # unify all numerics: nullable ints and decimals surface
            # differently per engine; values compare exactly in float64
            df[c] = s.astype("float64")
        elif str(s.dtype).startswith("datetime64"):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            # unify resolution: Spark's toPandas yields ns, DuckDB's
            # fetch_df yields us — the raw int64 payloads differ 1000x
            df[c] = s.astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    a, b = _canon(spark_df), _canon(oracle_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name or "frames")


def run_and_compare(spark, con, query_fn, sql: str, sf_dir: str, name: str = "") -> int:
    got = query_fn(spark, sf_dir).toPandas()
    want = con.execute(sql).fetch_df()
    compare_frames(got, want, name)
    return len(got)
