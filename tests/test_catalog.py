"""Every catalog entry vs its DuckDB oracle at sf0.001 (driver contract)."""

import pytest

from etl_spark.operators.catalog import CATALOG
from tests.compare import duckdb_connection, run_and_compare


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql])
def test_catalog_entry(spark, con, sf_dir, name):
    builder, sql = CATALOG[name]
    n = run_and_compare(spark, con, builder, sql, sf_dir, name)
    assert n > 0, f"{name}: empty result"


@pytest.mark.parametrize("name", [n for n, (_, sql) in CATALOG.items() if sql is None])
def test_catalog_entry_rows_only(spark, sf_dir, name):
    """Non-SQL-expressible entries (approx sketches): rows-only check,
    mirroring the driver's weaker gate for oracle-less queries."""
    builder, _ = CATALOG[name]
    assert builder(spark, sf_dir).count() > 0, f"{name}: empty result"
