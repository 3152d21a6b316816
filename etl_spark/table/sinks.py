"""Sink operators (SURVEY.md §2.2) — explicit API over the lake table
and plain-file writers.

| ref | sink | here |
|---|---|---|
| K1 | overwrite-file sink (`custom_data_connector.py:16-48`, `overwrite: true`) | ``ManifestTable.overwrite`` (snapshot-atomic full replace) |
| K2 | replace-table (`to_sql(if_exists='replace')`) | ``replace_table`` |
| K3 | append (`to_sql(if_exists='append')`) | ``append_table`` |
| K4 | chunked writes (`chunksize=1000`) | ``write_options(batch_rows=...)`` -> per-file row caps |
| K5 | replace + PK constraint | ``ManifestTable`` key_columns (identifier fields) |
| K7 | file put over a transfer channel | ``export_csv`` (directory of part files; transport is deployment-specific) |
| K8 | ensure-target-exists | ``ensure_table`` |
| K9 | notification/metrics sink | ``ReplayEngine.metrics`` / ``bucket_metrics`` tables |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_spark.table.manifest import ColumnDef, ManifestTable, TableSchema


def replace_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """K2: full replace — the default sink for reference jobs that
    rebuild a table every run."""
    df.write.mode("overwrite").format(fmt).options(**options).save(path)


def append_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """K3: append-only."""
    df.write.mode("append").format(fmt).options(**options).save(path)


def write_options(batch_rows: int | None = None) -> dict:
    """K4: chunking — maxRecordsPerFile bounds rows per output file the
    way to_sql(chunksize=...) bounded rows per INSERT."""
    return {} if batch_rows is None else {"maxRecordsPerFile": str(batch_rows)}


def export_csv(df: DataFrame, path: str, sep: str = ";", header: bool = True) -> None:
    """K7: CSV drop directory (the SFTP-put analog; ship the directory
    with whatever transport the deployment uses)."""
    df.write.mode("overwrite").option("sep", sep).option("header", header).csv(path)


def ensure_table(
    spark: SparkSession,
    root: str,
    columns: list[tuple[int, str, str]],
    key_columns: list[str],
    num_buckets: int = 16,
) -> ManifestTable:
    """K8: CREATE TABLE IF NOT EXISTS for the manifest format.

    On the EXISTS path the definition is validated eagerly: mismatched
    ``key_columns`` raise here (via the handle's recorded-layout check)
    instead of at the first read/merge, and ``columns``/``num_buckets``
    follow IF-NOT-EXISTS semantics — they describe the CREATE case and
    the recorded table wins (the handle plans against the snapshot's own
    bucket count and schema, so a differing request here is inert, never
    silently adopted)."""
    if ManifestTable.exists(root):
        t = ManifestTable(spark, root, key_columns)
        t.current_snapshot()  # raises on key_columns mismatch — fail at ensure, not first use
        return t
    schema = TableSchema([ColumnDef(i, n, t) for i, n, t in columns])
    return ManifestTable.create(spark, root, schema, key_columns=key_columns, num_buckets=num_buckets)
