"""etl_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference ETL service (Randers-Kommune-Digitalisering/etl):
binlog/WAL-shaped change replay, last-writer-wins upsert merge on a keyed
lake table, schema evolution in flight, exactly-once offset-fenced commits,
checkpoint resume, and a full relational operator catalog — all expressed
as pyspark.sql DataFrame plans plus vectorized pandas/Arrow UDFs.

Layout:
    session    — SparkSession builder (AQE, skew join, shuffle sizing)
    schema     — canonical schemas (repo-files table, change-event envelope)
    table      — manifest-based bucketed parquet table (atomic snapshots,
                 copy-on-write merge, schema evolution, commit properties)
    cdc        — changelog generation, classify, LWW, merge, replay, fencing
    operators  — relational + dedup + similarity + text-analysis catalog
    functions  — content normalization, hashing, text & vector helpers
    sources    — CSV repair / multi-format ingestion helpers
    streaming  — offset-bounded micro-batch planning
"""

__version__ = "0.1.0"
