"""XML ingest: recursive flatten of XML records to relational rows
(SURVEY.md S7/S8; reference ``src/utils/utils.py:13-21`` ``flatten_xml``
and ``pd.read_xml(xpath=...)`` ``src/sd_client.py:25,42,83``).

No spark-xml dependency: an Arrow-batched pandas UDF parses each XML
document with stdlib ElementTree and emits a JSON object per record
(leaf tag -> text, same rule as the reference's recursive descend);
``from_json`` with an explicit schema then takes it relational — the
imperative part touches only the opaque blob, everything after is
Catalyst-visible.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def flatten_element(element: ET.Element) -> dict:
    """Recursive leaf-collect in the spirit of the reference's
    ``flatten_xml`` (``src/utils/utils.py:13-21``), with two intentional
    deviations: the reference iterates ALL descendants (non-leaf tags
    contribute their mixed text too) and strips text whitespace; this
    version collects only leaf tags and keeps raw text, which is the
    lossless behavior for record-shaped XML. Repeated tags keep the last
    value (reference dict-update behavior) in both."""
    out: dict = {}
    for child in element:
        if len(child) == 0:
            out[child.tag] = child.text
        else:
            out.update(flatten_element(child))
    if not out and element.text is not None:
        out[element.tag] = element.text
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def _records_json_udf(xml_docs: pd.Series, record_tag: pd.Series) -> pd.Series:  # pragma: no cover
    def parse(doc: str | None, tag: str) -> list | None:
        if doc is None:
            return None
        try:
            root = ET.fromstring(doc)
        except ET.ParseError:
            return None
        return [
            json.dumps(flatten_element(rec), ensure_ascii=False)
            for rec in root.iter(tag)
        ]

    return pd.Series([parse(d, t) for d, t in zip(xml_docs, record_tag)])


def xml_records(xml_col: Column, record_tag: str, schema: str) -> Column:
    """Array of typed structs: one element per <record_tag> found in the
    document, fields per the given DDL schema (missing tags -> null)."""
    docs = _records_json_udf(xml_col, F.lit(record_tag))
    return F.transform(docs, lambda j: F.from_json(j, schema))


def read_xml_rows(
    df: DataFrame, xml_col: str, record_tag: str, schema: str,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Explode one row per XML record (the ``pd.read_xml(xpath=...)``
    analog, distributed).

    By default, rows whose document is malformed (or valid but contains
    no <record_tag>) produce no output rows — the explode drops them,
    so input/output counts differ with no signal. Pass ``corrupt_col``
    to keep ONE null-record row per malformed document, flagged true in
    that column (the ``columnNameOfCorruptRecord`` pattern): callers can
    count/route corruption instead of losing the rows' key columns."""
    recs = xml_records(F.col(xml_col), record_tag, schema)
    other = [c for c in df.columns if c != xml_col]
    if corrupt_col is None:
        return df.select(*other, F.explode(recs).alias("_rec")).select(*other, "_rec.*")
    if corrupt_col in df.columns or corrupt_col in ("__had_doc", "__recs"):
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with an existing input "
            "column (or an internal staging name) — withColumn would "
            "silently REPLACE that column's data with the corruption "
            "flag. Pick an unused name."
        )
    # null array = parse error; empty array = valid doc with no records.
    # explode_outer cannot distinguish the two, so flag first and keep
    # only real records plus the flagged corrupt rows.
    flagged = df.select(
        *other,
        F.col(xml_col).isNotNull().alias("__had_doc"),
        recs.alias("__recs"),
    ).withColumn(corrupt_col, F.col("__had_doc") & F.col("__recs").isNull())
    return (
        flagged.select(*other, corrupt_col, F.explode_outer("__recs").alias("_rec"))
        .filter(F.col("_rec").isNotNull() | F.col(corrupt_col))
        .select(*other, "_rec.*", corrupt_col)
    )
