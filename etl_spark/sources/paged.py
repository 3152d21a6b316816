"""Offset-paginated source: parallel page pulls across executors.

Re-expresses the reference's scroll/pagination extracts (SURVEY.md
S13/C15): the Elasticsearch scroll loop
(``src/utils/elastic_search_client.py:42-57``) and the offset-paged REST
pull (``src/zylinc/zylinc.py:6-52``) both fetch pages one at a time in a
driver-side ``while`` loop — serial, single connection, all hits
accumulated in one Python list.

The Spark-native shape: pagination is a *partitioning scheme*. Given
(total_count, page_size), the planner emits one row per page
(offset, limit) with ``spark.range`` — no driver loop, no list — and
``fetch_pages`` fans the page pulls out with ``mapInPandas``, so every
executor core holds its own connection and pulls its own disjoint
offset ranges (the analog of Elasticsearch *sliced* scroll). Results
stream out as Arrow batches; nothing is ever accumulated driver-side.
At 10^10 rows the page table is ~10^6 planning rows — itself a
distributed DataFrame.

The fetch callable must be deterministic per (offset, limit) and
serializable (executors unpickle it); sessions/connections must be
created INSIDE the callable (per partition), never captured.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_pages(
    spark: SparkSession, total_count: int, page_size: int, start_offset: int = 0
) -> DataFrame:
    """One row per page: (page_id, offset, limit). Pure ``spark.range``
    arithmetic — scales to any page count without driver involvement."""
    n_pages = max(0, -(-(total_count - start_offset) // page_size))
    return (
        spark.range(n_pages)
        .select(
            F.col("id").cast("int").alias("page_id"),
            (F.lit(start_offset) + F.col("id") * page_size).cast("long").alias("offset"),
            F.least(
                F.lit(page_size).cast("long"),
                F.lit(total_count) - (F.lit(start_offset) + F.col("id") * page_size),
            ).cast("int").alias("limit"),
        )
    )


def fetch_pages(
    pages: DataFrame,
    fetch: Callable[[int, int], "object"],
    schema: str,
    pages_per_task: int | None = None,
    n_pages: int | None = None,
) -> DataFrame:
    """Pull every planned page in parallel. ``fetch(offset, limit)`` must
    return a pandas DataFrame matching ``schema`` (a DDL string).

    ``pages_per_task`` repartitions the page table so each task owns a
    contiguous run of pages (fewer, longer-lived connections); default
    leaves the planner's partitioning (one ``spark.range`` slice per
    core). Pass ``n_pages`` when the page count is already known (it
    always is for ``plan_pages`` output — pure arithmetic) so no extra
    count job runs; the ``pages.count()`` fallback exists only for
    caller-built page tables of unknown size."""
    import pandas as pd  # noqa: F401  (documents the fetch contract)

    if pages_per_task:
        total = n_pages if n_pages is not None else pages.count()
        n = max(1, -(-total // pages_per_task))
        # range partitioning, not hash: the documented contract is that
        # each task owns a CONTIGUOUS run of pages (sequential offsets
        # per connection — range-local backends cache those); a hash
        # repartition scatters page ids and can skew task sizes
        pages = pages.repartitionByRange(n, "page_id")

    def pull(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            for off, lim in zip(b["offset"], b["limit"]):
                yield fetch(int(off), int(lim))

    return pages.mapInPandas(pull, schema=schema)


def read_paged(
    spark: SparkSession,
    total_count: int,
    page_size: int,
    fetch: Callable[[int, int], "object"],
    schema: str,
    pages_per_task: int | None = None,
) -> DataFrame:
    """plan + fetch in one call — the drop-in replacement for the
    reference's ``get_all_hits`` scroll loop. The page count is derived
    arithmetically (no count job)."""
    n_pages = max(0, -(-total_count // page_size))
    return fetch_pages(
        plan_pages(spark, total_count, page_size), fetch, schema,
        pages_per_task=pages_per_task, n_pages=n_pages,
    )
