from etl_spark.operators.catalog import CATALOG  # noqa: F401
