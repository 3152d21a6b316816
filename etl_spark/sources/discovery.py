"""File discovery: glob + mtime window + latest-only (SURVEY.md S14/S15).

The reference lists an SFTP directory, fnmatch-filters, and picks files
by mtime (``src/sensum/sensum.py:80-89``, ``:46-58``). The listing runs
through the Hadoop FileSystem glob — the same resolver Spark's own scan
planning uses, so any supported scheme (local, HDFS, S3A) works — NOT
by deriving files from per-row ``_metadata``: a zero-row file has no
rows, so row-derived metadata silently misses it and "latest file"
would return the second-newest export whenever the newest one is empty.
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
    a DataFrame. ``fmt`` is kept for signature stability with
    ``read_latest``; listing itself is format-agnostic (a directory
    listing, exactly the reference's semantics — empty files included,
    and a matched dataset DIRECTORY counts as one discoverable entry
    under its own mtime).

    The mtime window prunes WHILE iterating the listing, before any row
    is materialized — out-of-window entries cost one comparison each.
    The listing itself is a driver-side glob (the export directories
    this models hold 10^2-10^4 files); for 10^6-file trees, point the
    pattern at date-partitioned subdirectories so the glob — not the
    window filter — bounds the listing."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(pattern)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(jpath)
    rows = []
    for st in statuses or []:
        mtime = dt.datetime.fromtimestamp(st.getModificationTime() / 1000.0)
        if modified_after is not None and mtime < modified_after:
            continue
        if modified_before is not None and mtime > modified_before:
            continue
        rows.append((st.getPath().toString(), int(st.getLen()), mtime))
    return spark.createDataFrame(
        rows, "file_path string, file_size long, file_modification_time timestamp"
    )


def latest_file(spark: SparkSession, pattern: str, fmt: str = "parquet") -> str:
    """S15: top-1 by mtime via max_by over the file metadata."""
    row = (
        discover_files(spark, pattern, fmt)
        .agg(F.max_by("file_path", "file_modification_time").alias("p"))
        .first()
    )
    if row["p"] is None:
        raise FileNotFoundError(f"no files match {pattern!r}")
    return row["p"]


def read_latest(spark: SparkSession, pattern: str, fmt: str = "parquet", **options) -> DataFrame:
    """Read only the most recently modified file matching the glob."""
    return spark.read.format(fmt).options(**options).load(latest_file(spark, pattern, fmt))
