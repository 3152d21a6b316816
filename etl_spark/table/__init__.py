from etl_spark.table.manifest import ManifestTable, TableSchema, ColumnDef  # noqa: F401
