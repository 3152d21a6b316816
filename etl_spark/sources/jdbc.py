"""JDBC sources: partitioned full-table scans and pushdown-query scans.

Re-expresses the reference's database extracts (SURVEY.md S11/S12):
full-table reads (``src/jobs/frontdesk_borgerservice.py:126-138`` reads
MSSQL tables via pandas ``read_sql``) and pushdown query reads
(``src/capa/capa_data.py:28-31,76-81,120-132`` ships a SQL string to
MariaDB and pulls only the result).

Scale design — the pandas originals pull the whole table through one
connection on one machine; the Spark re-expression:

- **Partitioned reads**: ``partitionColumn/lowerBound/upperBound/
  numPartitions`` make every executor open its own connection and pull a
  disjoint range — extraction bandwidth scales with the cluster, not one
  socket. ``read_table`` auto-discovers the bounds with a 1-row
  min/max pushdown query when not given.
- **Pushdown queries**: ``read_query`` wraps the statement as a derived
  table (``dbtable = (q) alias``), so filters/joins/aggregations run in
  the database and only results cross the wire — the JDBC analog of
  predicate pushdown.
- Row-group sizing via ``fetchsize`` (default 10k) to keep the
  per-round-trip batch large enough to amortize latency.

The contract tests run against the Derby engine embedded in the Spark
distribution (a real JDBC endpoint, no external service).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCHSIZE = 10_000


def _base_reader(spark: SparkSession, url: str, driver: str | None, properties: dict | None):
    reader = spark.read.format("jdbc").option("url", url).option(
        "fetchsize", str(DEFAULT_FETCHSIZE)
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, str(v))
    return reader


def read_query(
    spark: SparkSession,
    url: str,
    query: str,
    driver: str | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """Pushdown-query scan (S12): the statement executes database-side;
    Spark sees only its result set. Single-partition by design — use for
    pre-aggregated / filtered pulls where the result is small; for bulk
    ranges use ``read_table`` with a partition column."""
    return _base_reader(spark, url, driver, properties).option("query", query).load()


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """Full-table scan (S11). With ``partition_column`` (a numeric/date
    column), the read is split into ``num_partitions`` disjoint range
    queries pulled in parallel by the executors; bounds are discovered
    with a min/max pushdown when not supplied (one cheap DB round trip,
    the standard ingest-planning probe)."""
    reader = _base_reader(spark, url, driver, properties)
    if partition_column is None:
        return reader.option("dbtable", table).load()
    if lower_bound is None or upper_bound is None:
        # the probe quotes the column (ANSI double quotes) because JDBC
        # writers create case-sensitive quoted identifiers; engines that
        # reject ANSI quoting (MySQL default mode) should pass explicit
        # bounds instead
        q = f'"{partition_column}"'
        bounds = read_query(
            spark,
            url,
            f"SELECT MIN({q}) AS lo, MAX({q}) AS hi FROM {table}",
            driver=driver,
            properties=properties,
        ).first()
        # fill in ONLY the missing side — a caller-supplied bound is a
        # deliberate range restriction (e.g. skip archived rows) and
        # must not be overwritten by the table's true min/max
        if lower_bound is None:
            lower_bound = bounds["LO"] if "LO" in bounds else bounds["lo"]
        if upper_bound is None:
            upper_bound = bounds["HI"] if "HI" in bounds else bounds["hi"]
        if lower_bound is None:  # empty table: any valid range works
            lower_bound = 0
        if upper_bound is None:
            upper_bound = int(lower_bound) + 1
    return (
        reader.option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    properties: dict | None = None,
) -> None:
    """JDBC sink (reference K-family ``to_sql`` analog) — mostly used by
    the contract tests to seed the embedded database."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, str(v))
    writer.mode(mode).save()
