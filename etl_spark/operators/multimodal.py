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
        # NULL payload (nullable text upstream: F.encode(NULL) is NULL)
        # -> NULL features, matching the SQL oracle's octet_length/
        # hex/sha256-of-NULL semantics instead of crashing the task
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pd.array(
                    [len(b) if b is not None else None for b in payload],
                    dtype="Int64",
                ),
                "magic": [b[:4].hex() if b is not None else None for b in payload],
                "payload_sha256": [
                    hashlib.sha256(b).hexdigest() if b is not None else None
                    for b in payload
                ],
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


DECODED_IMAGE_SCHEMA = (
    "doc_id long, height int, width int, channels int, "
    "resized_h int, resized_w int"
)


def _fake_decode_batches(target: int):
    """DETERMINISTIC FAKE decoder (the container has no media libs):
    image dimensions are derived from the payload's sha256, so the whole
    decode -> resize pipeline is reproducible and oracle-checkable. The
    mapInPandas plumbing — Arrow binary batches in, typed rows out — is
    the real production shape; only the dimension rule is fake. Resize
    preserves aspect ratio to fit a ``target`` x ``target`` box
    (integer floor arithmetic, identical in SQL)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> all-NULL dims (sha256(NULL) is NULL in the
            # oracle, and every derived column follows), not a task crash
            hexes = pdf["payload"].map(
                lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
            )
            h = hexes.map(lambda x: 16 + int(x[0:2], 16) % 48 if x else None)
            w = hexes.map(lambda x: 16 + int(x[2:4], 16) % 48 if x else None)
            c = hexes.map(lambda x: 1 + int(x[4], 16) % 3 if x else None)
            rh = [
                hi * target // max(hi, wi) if hi is not None else None
                for hi, wi in zip(h, w)
            ]
            rw = [
                wi * target // max(hi, wi) if wi is not None else None
                for hi, wi in zip(h, w)
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"],
                 "height": pd.array(h, dtype="Int32"),
                 "width": pd.array(w, dtype="Int32"),
                 "channels": pd.array(c, dtype="Int32"),
                 "resized_h": pd.array(rh, dtype="Int32"),
                 "resized_w": pd.array(rw, dtype="Int32")}
            )

    return kernel


def image_decode_resize(spark: SparkSession, sf_dir: str, target: int = 32) -> DataFrame:
    """Catalog entry: the decode + resize pipeline over binary payloads
    (deterministic-fake decode, real Arrow plumbing — see
    ``_fake_decode_batches``)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    env = with_binary_payload(d).select("doc_id", "payload")
    return env.mapInPandas(_fake_decode_batches(target), DECODED_IMAGE_SCHEMA)


IMAGE_DECODE_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id,
         16 + CAST('0x' || substring(sha256(text), 1, 2) AS INT) % 48 AS height,
         16 + CAST('0x' || substring(sha256(text), 3, 2) AS INT) % 48 AS width,
         1 + CAST('0x' || substring(sha256(text), 5, 1) AS INT) % 3 AS channels
  FROM documents
)
SELECT doc_id, height, width, channels,
       CAST(FLOOR(height * 32.0 / GREATEST(height, width)) AS INT) AS resized_h,
       CAST(FLOOR(width * 32.0 / GREATEST(height, width)) AS INT) AS resized_w
FROM dims
"""


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_magic string"
FRAME_BYTES = 64
SAMPLE_EVERY = 10


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1-to-N mapInPandas kernel: treat the payload as a fixed-size-frame
    'video', emit one row per SAMPLE_EVERY-th frame with its leading
    bytes as the frame fingerprint. Real frame decode would replace the
    slicing with ffmpeg — the batch fan-out shape (rows out != rows in)
    is the production contract being exercised."""
    for pdf in batches:
        ids, idxs, magics = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # NULL payload has no frames — the oracle's
                # WHERE n_frames > 0 drops the row the same way
                continue
            # a NULL doc_id reaches the kernel as NaN (Spark ships
            # nullable longs to pandas as float64) — keep the row with a
            # null id, exactly like the oracle's NULL passthrough; the
            # nullable Int64 output array below is what permits it
            # (a plain int64 array raises on NaN and kills the task)
            if doc_id is not None and pd.isna(doc_id):
                doc_id = None
            n_frames = len(payload) // FRAME_BYTES
            for f in range(0, n_frames, SAMPLE_EVERY):
                ids.append(doc_id)
                idxs.append(f)
                magics.append(payload[f * FRAME_BYTES : f * FRAME_BYTES + 4].hex())
        yield pd.DataFrame(
            {"doc_id": pd.array(ids, dtype="Int64"),
             "frame_idx": pd.array(idxs, dtype="int32"),
             "frame_magic": magics}
        )


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: video-style frame sampling over binary payloads
    (every SAMPLE_EVERY-th FRAME_BYTES-sized frame)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    env = with_binary_payload(d).select("doc_id", "payload")
    return env.mapInPandas(_frame_sample_batches, FRAME_SAMPLE_SCHEMA)


FRAME_SAMPLE_SQL = f"""
WITH frames AS (
  -- DuckDB cannot substring a BLOB; slice its hex image instead
  -- (1 byte = 2 hex chars)
  SELECT doc_id, hex(encode(text)) AS payload_hex,
         CAST(FLOOR(octet_length(encode(text)) / {FRAME_BYTES}) AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, CAST(u.f AS INT) AS frame_idx,
       lower(substring(payload_hex, u.f * {FRAME_BYTES * 2} + 1, 8)) AS frame_magic
FROM frames, UNNEST(generate_series(0, n_frames - 1, {SAMPLE_EVERY})) AS u(f)
WHERE n_frames > 0
"""
