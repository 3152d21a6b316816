"""Source connectors: CSV dialects, file discovery, byte-level repair,
schema inference/coercion (SURVEY.md §2.1 S1-S6/S14-S15/S18, §2.10 C13)."""

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
