"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct; decode / feature-extract run as
Arrow-batched ``mapInPandas`` over the binary payloads (never per-row
Python on the driver). The actual media decode is STUBBED — the
container has no image/audio libraries — behind
``decode_image_batch``; everything Spark-side (schema, batch shape,
partitioning, UDF signature) is real and tested.

The documents table stands in for a media corpus: ``payload =
encode(text, 'utf-8')`` is the opaque blob. Byte-level features
(length, magic prefix, sha256) are computable by the DuckDB oracle, so
the plumbing is hash-verified end-to-end even though decode is fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BINARY_FEATURES_SCHEMA = (
    "doc_id long, byte_len long, magic string, payload_sha256 string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct — the
    multimodal envelope (media_type/codec tagged; binary is pass-through)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.lit("utf-8").alias("codec"),
            F.length(F.col(text_col)).alias("decoded_len"),
        ),
    )


def _binary_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per Arrow batch, vectorized byte features.
    sha256 via hashlib over the raw bytes (C-speed per element, no
    Python-level row loop beyond the comprehension the Arrow batch
    already materializes)."""
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payload.map(len).astype("int64"),
                "magic": payload.map(lambda b: b[:4].hex()),
                "payload_sha256": payload.map(lambda b: hashlib.sha256(b).hexdigest()),
            }
        )


def binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over binary payloads via mapInPandas
    (the real multimodal hot path; decode itself is stubbed separately)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    env = with_binary_payload(d).select("doc_id", "payload")
    return env.mapInPandas(_binary_features_batches, BINARY_FEATURES_SCHEMA)


BINARY_PAYLOAD_STATS_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       lower(substring(hex(encode(text)), 1, 8)) AS magic,
       sha256(text) AS payload_sha256
FROM documents
"""


def decode_image_batch(payloads: pd.Series) -> pd.Series:  # pragma: no cover
    """STUB: real image decode (PIL/libvips) is unavailable in this
    container. The Spark-side contract — binary Series in, fixed-shape
    feature Series out, called only from mapInPandas — is what the
    engine guarantees; swap this body for a real decoder in production."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; wire a real decoder here — "
        "the mapInPandas plumbing (Arrow batches of binary) is already in place"
    )


def frame_sample_stub(payloads: pd.Series, every_n: int = 10) -> pd.Series:  # pragma: no cover
    """STUB: video frame sampling — same contract as decode_image_batch."""
    raise NotImplementedError("video frame sampling requires ffmpeg bindings")
