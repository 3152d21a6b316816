"""Metadata-driven schema source (SURVEY.md S10).

The reference builds a DataFrame header from an API's own metadata
block: ``src/jobindsats/jobindsats.py:33-38`` takes
``data[0]['Variables']`` (a list of variable descriptors), extracts
``var['Label']`` per column, and zips it onto the positional rows in
``data[0]['Data']``. The schema is *data from the source*, not code.

Spark re-expression: descriptor list -> StructType (typed, not
all-string: a ``Type`` field maps to Spark types when present), then
``spark.createDataFrame(rows, schema)``. A rename map applies
label -> canonical-name normalization afterwards (reference
``rename_map``, F17 bulk rename).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# API metadata type labels -> Spark types (defensive lowercase match);
# unknown labels fall back to string, the reference's implicit behavior
# (pandas object columns).
_TYPE_MAP = {
    "string": T.StringType(),
    "text": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "decimal": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
}


def schema_from_metadata(
    variables: list[dict],
    label_key: str = "Label",
    type_key: str = "Type",
) -> T.StructType:
    """Build a StructType from an API variable-descriptor list."""
    fields = []
    for var in variables:
        name = var[label_key]
        dtype = _TYPE_MAP.get(str(var.get(type_key, "string")).lower(), T.StringType())
        fields.append(T.StructField(name, dtype, nullable=True))
    return T.StructType(fields)


def dataframe_from_api_payload(
    spark: SparkSession,
    payload: dict,
    variables_key: str = "Variables",
    data_key: str = "Data",
    rename_map: dict[str, str] | None = None,
) -> DataFrame:
    """``{'Variables': [...], 'Data': [[...], ...]}`` -> typed DataFrame.

    Positional rows are zipped onto the metadata-derived schema exactly
    as the reference's ``pd.DataFrame(data, columns=labels)`` does, then
    the rename map normalizes verbose API labels to canonical column
    names (``src/jobindsats/jobindsats.py:42-51``)."""
    schema = schema_from_metadata(payload[variables_key])
    rows = [tuple(r) for r in payload[data_key]]
    # API payloads are driver-local and small — one partition, not a
    # defaultParallelism-wide fan-out of near-empty python tasks
    n_slices = max(1, min(8, len(rows) // 10_000))
    df = spark.createDataFrame(spark.sparkContext.parallelize(rows, n_slices), schema)
    if rename_map:
        df = df.withColumnsRenamed(rename_map)
    return df


# Catalog instance (S10): a jobindsats-shaped payload — schema built
# from the API's own Variables block, verbose labels renamed.
_CATALOG_PAYLOAD = {
    "Variables": [
        {"Label": "Periode", "Type": "string"},
        {"Label": "Area", "Type": "string"},
        {"Label": "Forventet antal fuldtidspersoner", "Type": "int"},
        {"Label": "Faktisk andel (pct.)", "Type": "double"},
    ],
    "Data": [
        ["2024M01", "Randers", 120, 3.5],
        ["2024M02", "Randers", 131, 3.7],
        ["2024M01", "Favrskov", 88, 2.9],
        ["2024M02", "Favrskov", 94, 3.1],
    ],
}


def metadata_schema_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: metadata-driven header + rename normalization
    (``sf_dir`` unused — the payload IS the source, as in the reference
    where the API ships both schema and rows)."""
    return dataframe_from_api_payload(
        spark,
        _CATALOG_PAYLOAD,
        rename_map={"Area": "Omraade", "Forventet antal fuldtidspersoner": "forventet"},
    )


METADATA_SCHEMA_FRAME_SQL = """
SELECT * FROM (VALUES
  ('2024M01', 'Randers', 120, 3.5),
  ('2024M02', 'Randers', 131, 3.7),
  ('2024M01', 'Favrskov', 88, 2.9),
  ('2024M02', 'Favrskov', 94, 3.1)
) AS t(Periode, Omraade, forventet, "Faktisk andel (pct.)")
"""
