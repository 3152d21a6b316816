"""Content normalization + sha256 fingerprinting.

The per-row invariant of the whole engine is
``sha256(normalize(content))`` equality between the Spark path and the
oracle. To make that byte-exact, there is ONE pure-Python normalization
rule here, used three ways:

1. ``normalize_content`` — scalar, pure; imported by the pandas/DuckDB
   oracle in tests.
2. ``normalize_series`` — vectorized pandas implementation (same rule,
   pandas ``.str`` kernels; no per-row Python in the hot path).
3. ``normalize_udf`` — Arrow-batched pandas_udf wrapping (2) for Spark.

Hashing itself stays JVM-side (``F.sha2(col, 256)``) — identical hex
output to ``hashlib.sha256(...).hexdigest()``.

Normalization rule (fixed, documented, versioned):
- Unicode NFC normalization
- CRLF / lone CR -> LF
- strip trailing whitespace (spaces/tabs) on every line
- drop trailing blank lines; non-empty content ends with exactly one LF

Reference analog: whole-frame string cleanup before load
(reference ``src/jobs/sd_delta.py:28``, ``src/utils/utils.py:7-10``) —
re-expressed as a deterministic, versioned rule instead of ad-hoc maps.
"""

from __future__ import annotations

import hashlib
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

NORMALIZATION_VERSION = 1

_TRAILING_WS = r"[ \t]+(?=\n)|[ \t]+\Z"


def normalize_content(text: str | None) -> str | None:
    """Pure scalar normalization — the single source of truth."""
    if text is None:
        return None
    s = unicodedata.normalize("NFC", text)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    lines = [ln.rstrip(" \t") for ln in s.split("\n")]
    while lines and lines[-1] == "":
        lines.pop()
    if not lines:
        return ""
    return "\n".join(lines) + "\n"


def sha256_hex(text: str | None) -> str | None:
    """Oracle-side fingerprint: hex sha256 of utf-8 bytes."""
    if text is None:
        return None
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas implementation of the same rule."""
    mask = s.notna()
    out = s.copy()
    v = s[mask].astype(str)
    v = v.str.normalize("NFC")
    v = v.str.replace("\r\n", "\n", regex=False).str.replace("\r", "\n", regex=False)
    v = v.str.replace(_TRAILING_WS, "", regex=True)
    # drop trailing blank lines, re-add single trailing LF for non-empty
    v = v.str.replace(r"\n+\Z", "", regex=True)
    v = v.where(v == "", v + "\n")
    out[mask] = v
    return out


@pandas_udf(T.StringType())
def normalize_udf(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return normalize_series(s)


def content_sha256_col(content: Column) -> Column:
    """normalize (Arrow-vectorized) then hash JVM-side."""
    return F.sha2(normalize_udf(content), 256)


def with_content_sha256(df: DataFrame, content_col: str = "content", out_col: str = "content_sha256") -> DataFrame:
    """Attach the canonical fingerprint column; null content -> null hash."""
    return df.withColumn(
        out_col,
        F.when(F.col(content_col).isNull(), F.lit(None).cast("string")).otherwise(
            content_sha256_col(F.col(content_col))
        ),
    )
