"""Multi-level nested-JSON flattener (SURVEY.md S9).

The reference descends four dict levels by hand to reach its payload
(``src/jobs/uddannelsesstatistik.py:63-72``:
``data['data']['attributes']['results'][...]`` chains). The Spark
re-expression is schema-on-read: ``from_json`` with an explicit nested
schema, then ONE generated projection that pulls every struct leaf up to
a top-level column named by its path (``a.b.c`` -> ``a_b_c``) — the
JSON twin of ``sources/xml.py``'s recursive element flatten.

Everything is a column expression (from_json + nested field access runs
in the JVM, codegen-friendly, no UDF); the recursion happens once at
plan-build time over the SCHEMA, never per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _leaf_paths(dtype: T.DataType, prefix: list[str]) -> list[list[str]]:
    """Enumerate struct leaf paths (depth-first, declaration order).
    Arrays/maps stop the descent and surface as-is at their path — the
    caller explodes them explicitly if element access is wanted."""
    if isinstance(dtype, T.StructType):
        out: list[list[str]] = []
        for f in dtype.fields:
            out.extend(_leaf_paths(f.dataType, prefix + [f.name]))
        return out
    return [prefix]


def flatten_json_column(
    df: DataFrame, column: str, schema: str | T.StructType, sep: str = "_",
    drop_source: bool = True,
) -> DataFrame:
    """Parse ``column`` as JSON with ``schema`` (DDL string or StructType)
    and lift every nested leaf to a top-level column named by its
    ``sep``-joined path. Missing keys become nulls (from_json semantics —
    matching the reference's ``.get`` chains)."""
    parsed = df.withColumn("__flat_json", F.from_json(F.col(column), schema))
    struct_type = parsed.schema["__flat_json"].dataType
    leaf_cols = [
        F.col(".".join(["__flat_json", *path])).alias(sep.join(path))
        for path in _leaf_paths(struct_type, [])
    ]
    keep = [c for c in df.columns if not (drop_source and c == column)]
    return parsed.select(*keep, *leaf_cols)


def json_nested_flatten(spark, sf_dir: str) -> DataFrame:
    """Catalog entry (S9): round-trip a 3-level nested payload built from
    the orders table through to_json -> from_json -> flatten; the oracle
    computes the flattened ground truth directly, so any loss in the
    nesting/flattening round trip fails the value hash."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nested = o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.struct(
                    F.struct(
                        F.col("o_orderstatus").alias("status"),
                        F.col("o_orderpriority").alias("priority"),
                    ).alias("meta"),
                    F.col("o_totalprice").alias("price"),
                ).alias("order"),
                F.col("o_custkey").alias("cust"),
            )
        ).alias("payload"),
    )
    return flatten_json_column(
        nested,
        "payload",
        # struct<...> single-type form: the bare "col type, ..." DDL list
        # rejects backticked (reserved-word) field names like `order`
        "struct<`order`: struct<meta: struct<status: string, priority: string>, price: double>, cust: bigint>",
    )


JSON_NESTED_FLATTEN_SQL = """
SELECT o_orderkey,
       o_orderstatus AS order_meta_status,
       o_orderpriority AS order_meta_priority,
       o_totalprice AS order_price,
       o_custkey AS cust
FROM orders
"""
