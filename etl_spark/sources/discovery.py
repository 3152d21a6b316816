"""File discovery: glob + mtime window + latest-only (SURVEY.md S14/S15).

The reference lists an SFTP directory, fnmatch-filters, and picks files
by mtime (``src/sensum/sensum.py:80-89``, ``:46-58``). Spark-native:
read the glob, then filter on the ``_metadata`` hidden column — the
mtime/path predicates prune at the file index level, no driver-side
listing loop.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def discover_files(
    spark: SparkSession,
    pattern: str,
    fmt: str = "parquet",
    modified_after: dt.datetime | None = None,
    modified_before: dt.datetime | None = None,
) -> DataFrame:
    """Return (file_path, file_size, file_modification_time) for the files
    a glob resolves to, optionally mtime-windowed — the discovery step as
    a DataFrame (distinct over the scan's _metadata, touches no row data
    beyond footers)."""
    df = spark.read.format(fmt).load(pattern).select("_metadata.*")
    meta = df.select("file_path", "file_size", "file_modification_time").distinct()
    if modified_after is not None:
        meta = meta.filter(F.col("file_modification_time") >= F.lit(modified_after))
    if modified_before is not None:
        meta = meta.filter(F.col("file_modification_time") <= F.lit(modified_before))
    return meta


def latest_file(spark: SparkSession, pattern: str, fmt: str = "parquet") -> str:
    """S15: top-1 by mtime via max_by over the file metadata."""
    row = (
        discover_files(spark, pattern, fmt)
        .agg(F.max_by("file_path", "file_modification_time").alias("p"))
        .first()
    )
    return row["p"]


def read_latest(spark: SparkSession, pattern: str, fmt: str = "parquet", **options) -> DataFrame:
    """Read only the most recently modified file matching the glob."""
    return spark.read.format(fmt).options(**options).load(latest_file(spark, pattern, fmt))
