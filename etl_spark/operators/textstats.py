"""Text-analysis operators over the documents table — the training-data
pipeline suite (language ID, quality scoring, token counting, document
fingerprinting). All JVM-side expressions (no Python in the hot path);
each has an exact DuckDB oracle twin.

Design for 100 TB: every operator here is a narrow projection + scalar
expressions — embarrassingly parallel, no shuffle, full whole-stage
codegen, predicate/column pruning reaches the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators.relational import t

# marker-token sets for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "da": ["og", "det", "er", "en", "til", "af"],
}

_TOKEN_SPLIT = r"[^a-z0-9æøåáéíóúñü]+"

# explicit whitespace class, identical in Java regex (Spark) and RE2
# (DuckDB): Java's \s includes vertical tab \x0B but RE2's does not, so
# a bare \s on both sides diverges on text containing \x0B
_WS_CHARS = r" \t\n\x0B\f\r"
_WS_SPLIT = f"[{_WS_CHARS}]+"


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda x: x != "")


def _marker_count(tokens, markers: list[str]):
    # count tokens that are in the marker set (multiplicity preserved)
    def pred(x):
        e = F.lit(False)
        for m in markers:
            e = e | (x == m)
        return e

    return F.size(F.filter(tokens, pred))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with deterministic tie-break
    (en >= es >= da). Vectorized JVM expressions only."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    s = {lg: _marker_count(toks, ms) for lg, ms in _LANG_MARKERS.items()}
    pick = (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["da"]), "en")
        .when(s["es"] >= s["da"], "es")
        .otherwise("da")
    )
    return d.select(
        "doc_id",
        s["en"].alias("score_en"),
        s["es"].alias("score_es"),
        s["da"].alias("score_da"),
        pick.alias("lang_pred"),
    )


LANG_ID_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS tokens
  FROM documents
)
SELECT doc_id,
  len(list_filter(tokens, x -> x IN ('the','and','of','to','is','in')))  AS score_en,
  len(list_filter(tokens, x -> x IN ('el','la','de','que','y','los')))   AS score_es,
  len(list_filter(tokens, x -> x IN ('og','det','er','en','til','af')))  AS score_da,
  CASE WHEN len(list_filter(tokens, x -> x IN ('the','and','of','to','is','in'))) >= len(list_filter(tokens, x -> x IN ('el','la','de','que','y','los')))
        AND len(list_filter(tokens, x -> x IN ('the','and','of','to','is','in'))) >= len(list_filter(tokens, x -> x IN ('og','det','er','en','til','af')))
       THEN 'en'
       WHEN len(list_filter(tokens, x -> x IN ('el','la','de','que','y','los'))) >= len(list_filter(tokens, x -> x IN ('og','det','er','en','til','af')))
       THEN 'es' ELSE 'da' END AS lang_pred
FROM toks
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (alnum runs and
    punctuation count separately) — the two standard budget counters."""
    d = t(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), _WS_SPLIT), lambda x: x != ""))
    # BPE-ish proxy: alphanumeric runs + standalone symbol characters
    runs = F.size(F.filter(F.split(F.col("text"), r"[^A-Za-z0-9]+"), lambda x: x != ""))
    syms = F.length(F.regexp_replace(F.col("text"), f"[A-Za-z0-9{_WS_CHARS}]", ""))
    return d.select(
        "doc_id", ws.alias("ws_tokens"), (runs + syms).cast("long").alias("subword_tokens")
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '{_WS_SPLIT}'), x -> x <> '')) AS ws_tokens,
       CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> x <> ''))
            + LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9{_WS_CHARS}]', '', 'g')) AS BIGINT) AS subword_tokens
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: length, mean word length, punctuation
    ratio, stopword ratio, composite score. Ratios rounded to 6 dp so the
    value hash is engine-independent."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", ""))
    n_stop = _marker_count(toks, _LANG_MARKERS["en"])
    mean_wl = F.round(
        F.when(n_tok > 0, F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast("double") / n_tok).otherwise(F.lit(0.0)),
        6,
    )
    punct_ratio = F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 6)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_obs"),
        n_tok.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        ((n_tok >= 10) & (stop_ratio > 0)).cast("int").alias("passes_quality"),
    )


QUALITY_SCORE_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS tokens,
         LENGTH(text) AS n_chars_obs
  FROM documents
)
SELECT doc_id, n_chars_obs,
  len(tokens) AS n_tokens,
  ROUND(CASE WHEN len(tokens) > 0
        THEN CAST(list_aggregate(list_transform(tokens, x -> LENGTH(x)), 'sum') AS DOUBLE) / len(tokens)
        ELSE 0.0 END, 6) AS mean_word_len,
  ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
  ROUND(CAST(len(list_filter(tokens, x -> x IN ('the','and','of','to','is','in'))) AS DOUBLE)
        / GREATEST(len(tokens), 1), 6) AS stopword_ratio,
  CAST(len(tokens) >= 10 AND
       ROUND(CAST(len(list_filter(tokens, x -> x IN ('the','and','of','to','is','in'))) AS DOUBLE)
             / GREATEST(len(tokens), 1), 6) > 0 AS INT) AS passes_quality
FROM base
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical content fingerprint: sha256 of whitespace-collapsed
    lowercased text (the relational analog of the CDC engine's
    normalize+sha256 invariant, reference ``src/utils/utils.py:7-10``)."""
    d = t(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.trim(F.lower(F.col("text"))), _WS_SPLIT, " ")
    return d.select("doc_id", F.sha2(canon, 256).alias("fingerprint"))


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id, sha256(REGEXP_REPLACE(TRIM(lower(text)), '{_WS_SPLIT}', ' ', 'g')) AS fingerprint
FROM documents
"""


# --- PII scrubbing (training-data redaction stage) -----------------------
# Portable regex subset only: character classes, bounded repetition, no
# lookaround/backreferences — identical semantics in Java regex (Spark)
# and RE2 (DuckDB), so one pattern string drives both engines. ASCII
# patterns by design (the standard pragmatic scope for corpus scrubbing;
# IDN emails etc. are a model-based stage, not a regex one).
PII_PATTERNS = [
    # order matters and is part of the contract: email first (an email's
    # digits must not be half-eaten by the phone rule), then the 16-digit
    # grouped card, then IPv4, then international phone
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"[0-9]{4}([ -]?[0-9]{4}){3}", "<CARD>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,16}[0-9]", "<PHONE>"),
]


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / card numbers / IPv4s / international phone
    numbers from document text, with per-class match counts — the
    corpus-scrubbing stage of a training-data pipeline. Pure JVM
    regexp_replace/regexp_count chain: narrow projection, no shuffle,
    whole-stage codegen, same 100 TB shape as the rest of this module.
    Counts are computed on the ORIGINAL text per class (so a phone
    inside an email counts as email only if the email rule ate it —
    counts follow the same application order as the replacements)."""
    d = t(spark, sf_dir, "documents")
    scrubbed = F.col("text")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(scrubbed, F.lit(pat)).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return d.select("doc_id", scrubbed.alias("text_scrubbed"), *counts)


def _pii_sql() -> str:
    """DuckDB twin generated from the SAME pattern table: one CTE per
    class, counting on the progressively-scrubbed text of the PRIOR
    classes exactly like the Spark loop (RE2 runs the identical
    portable patterns)."""
    ctes = ["s0 AS (SELECT doc_id, text AS t FROM documents)"]
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        ctes.append(
            f"s{i + 1} AS (SELECT doc_id, "
            f"len(regexp_extract_all(t, '{pat}')) AS n_{name}, "
            f"regexp_replace(t, '{pat}', '{repl}', 'g') AS t, "
            + ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS[:i])
            + (", " if i else "")
            + f"FROM s{i})".replace(", FROM", " FROM")
        )
    names = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT doc_id, t AS text_scrubbed, {names} FROM s{len(PII_PATTERNS)}"
    )


PII_SCRUB_SQL = _pii_sql()


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher-style quality rules
    that length/punct/stopword ratios miss): fraction of non-blank lines
    that are duplicates of an earlier line, the highest single-line
    frequency, and the distinct-line ratio. A page of repeated menu rows
    scores high dup_line_fraction while passing every surface check in
    ``quality_score``.

    JVM-only set algebra on the split array (no explode, no shuffle —
    same narrow-projection shape as the rest of this module). The
    max_line_freq term is O(distinct_lines x lines) per ROW — constant
    work for real page shapes (10^2-10^3 lines) and embarrassingly
    parallel; a corpus of pathological 10^5-line documents would switch
    to posexplode + two-level groupBy instead (the boilerplate_line_dedup
    shape). Documents here are newline-free by construction, so lines
    fall back to sentence-ish '.'-splits when no newline exists; both
    engines apply the identical rule."""
    d = t(spark, sf_dir, "documents")
    raw = F.when(
        F.col("text").contains("\n"), F.split("text", "\n")
    ).otherwise(F.split("text", r"\.")) 
    lines = F.filter(
        F.transform(raw, lambda x: F.trim(x)), lambda x: x != ""
    )
    n = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    # highest single-line frequency without an explode: for each
    # DISTINCT line, count its occurrences in the full array, take max
    max_freq = F.array_max(
        F.transform(
            F.array_distinct(lines),
            lambda u: F.size(F.filter(lines, lambda x: x == u)),
        )
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_lines"),
        F.round(
            F.when(n > 0, (n - n_distinct).cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("dup_line_fraction"),
        F.coalesce(max_freq, F.lit(0)).cast("bigint").alias("max_line_freq"),
        F.round(
            F.when(n > 0, n_distinct.cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("distinct_line_ratio"),
    )


REPETITION_STATS_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(
           CASE WHEN contains(text, chr(10)) THEN string_split(text, chr(10))
                ELSE string_split(text, '.') END,
           x -> trim(x)), x -> x <> '') AS lines
  FROM documents
),
stats AS (
  SELECT doc_id, lines,
         len(lines) AS n,
         len(list_distinct(lines)) AS n_distinct
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_lines,
       ROUND(CASE WHEN n > 0 THEN CAST(n - n_distinct AS DOUBLE) / n ELSE 0.0 END, 6) AS dup_line_fraction,
       CAST(COALESCE(list_max(list_transform(list_distinct(lines),
            u -> len(list_filter(lines, x -> x = u)))), 0) AS BIGINT) AS max_line_freq,
       ROUND(CASE WHEN n > 0 THEN CAST(n_distinct AS DOUBLE) / n ELSE 0.0 END, 6) AS distinct_line_ratio
FROM stats
"""
