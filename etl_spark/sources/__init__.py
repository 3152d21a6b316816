"""Source connectors: CSV dialects, file discovery, byte-level repair,
schema inference/coercion, JDBC, offset-paginated pulls, metadata-driven
schemas (SURVEY.md §2.1 S1-S6/S10-S15/S18, §2.10 C13/C15)."""

from etl_spark.sources.csv import (  # noqa: F401
    read_csv_danish,
    read_csv_headerless,
    read_csv_pruned,
    read_csv_repaired,
    read_csv_tab,
)
from etl_spark.sources.discovery import discover_files, latest_file  # noqa: F401
from etl_spark.sources.coerce import coerce_string_columns  # noqa: F401
from etl_spark.sources.xml import read_xml_rows, xml_records, flatten_element  # noqa: F401
from etl_spark.sources.jdbc import read_query, read_table, write_table  # noqa: F401
from etl_spark.sources.json_flatten import flatten_json_column  # noqa: F401
from etl_spark.sources.csv import read_config_csv, read_csv_multifile, split_by_predicate  # noqa: F401
from etl_spark.sources.paged import fetch_pages, plan_pages, read_paged  # noqa: F401
from etl_spark.sources.metadata import (  # noqa: F401
    dataframe_from_api_payload,
    schema_from_metadata,
)
