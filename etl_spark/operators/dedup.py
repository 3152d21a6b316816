"""Deduplication suite over the documents table: exact, n-gram Jaccard,
MinHash+LSH, SimHash. The training-data-pipeline operators a 100 TB
corpus needs, each with an exact DuckDB oracle twin.

Scale design notes:
- exact dedup: one hash-groupBy on the canonical fingerprint (map-side
  combine; no sort). At 100 TB the fingerprint is computed at scan time
  and the groupBy shuffles only (hash, doc_id) pairs, not content.
- MinHash+LSH: the classic band trick — candidate generation joins docs
  only within identical (band, band_key) buckets, never all-pairs. All
  hashing is md5-based so Spark and DuckDB produce identical signatures.
- SimHash: bit-majority fingerprint via explode + aggregate; near-dup
  pairs = fingerprints at Hamming distance <= k within LSH-style
  prefix buckets (here: exact-match on the fingerprint for the oracle
  twin, distance join kept Spark-side).
- n-gram Jaccard: shingle inverted index join (pair candidates share at
  least one shingle) -> exact Jaccard filter. Quadratic only within
  shingle groups, which is the standard scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators.relational import t

_TOKEN_SPLIT = r"[^a-z0-9æøåáéíóúñü]+"
N_MINHASH = 8  # 4 bands x 2 rows
N_BANDS = 4
ROWS_PER_BAND = 2


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda x: x != "")


def _shingles(col, n: int = 3):
    """Word n-gram shingles as strings (distinct); empty array for docs
    shorter than n tokens."""
    toks = _tokens(col)
    k = F.size(toks)
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by canonical fingerprint: keep the min doc_id per
    group, report group size (reference A6 ``drop_duplicates``,
    re-expressed as hash-groupBy so it scales without a sort)."""
    d = t(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        d.select("doc_id", F.sha2(canon, 256).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


DEDUP_EXACT_SQL = r"""
SELECT sha256(REGEXP_REPLACE(TRIM(lower(text)), '\s+', ' ', 'g')) AS fp,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard >= threshold.
    Candidates from a shingle inverted index (pairs must share a
    shingle), then exact |A∩B| / |A∪B|."""
    d = t(spark, sf_dir, "documents").select("doc_id", _shingles(F.col("text")).alias("sh"))
    d = d.withColumn("n_sh", F.size("sh")).filter(F.col("n_sh") > 0)
    inv = d.select("doc_id", "n_sh", F.explode("sh").alias("g"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    jac = F.round(
        F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
    )
    return common.select("doc_a", "doc_b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


NGRAM_JACCARD_SQL = f"""
WITH g0 AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         )) AS grams
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS toks
        FROM documents)
),
sh AS (
  SELECT doc_id, len(grams) AS n_sh, u.g
  FROM g0, UNNEST(grams) AS u(g)
  WHERE len(grams) > 0
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS n_common, ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
FROM common
WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) >= 0.5
"""


def _minhash_sig(col):
    """MinHash signature: per seed s, min over shingles of
    md5(s || '|' || shingle). String-min keeps Spark/DuckDB identical."""
    sh = _shingles(col)
    sigs = []
    for s in range(N_MINHASH):
        sigs.append(F.array_min(F.transform(sh, lambda g, s=s: F.md5(F.concat(F.lit(f"{s}|"), g)))))
    return sh, sigs


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.4) -> DataFrame:
    """MinHash+LSH near-dup candidates -> exact Jaccard verify.

    Banding: {N_BANDS} bands x {ROWS_PER_BAND} rows; candidates collide on
    at least one full band. Verification recomputes exact shingle Jaccard
    on candidates only — the scalable two-phase shape."""
    d = t(spark, sf_dir, "documents")
    sh, sigs = _minhash_sig(F.col("text"))
    base = d.select("doc_id", sh.alias("sh"), *[s.alias(f"mh{i}") for i, s in enumerate(sigs)])
    base = base.filter(F.size("sh") > 0).cache()

    bands = []
    for b in range(N_BANDS):
        key = F.concat_ws("#", *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)])
        bands.append(base.select("doc_id", F.lit(b).alias("band"), key.alias("bkey")))
    allbands = bands[0]
    for x in bands[1:]:
        allbands = allbands.unionByName(x)

    a, b2 = allbands.alias("a"), allbands.alias("b")
    cand = (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


MINHASH_LSH_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         )) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS toks
        FROM documents)
),
sigs AS (
  SELECT doc_id, sh,
    {",".join(f"list_aggregate(list_transform(sh, g -> md5('{s}|' || g)), 'min') AS mh{s}" for s in range(N_MINHASH))}
  FROM docs WHERE len(sh) > 0
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, mh{b * ROWS_PER_BAND} || '#' || mh{b * ROWS_PER_BAND + 1} AS bkey FROM sigs"
      for b in range(N_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a JOIN sigs sb ON sb.doc_id = c.doc_b
WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.4
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per bit j, majority vote over tokens of the high
    bit of md5 hex digit j; fingerprint packs the 16 votes. Token
    multiplicity preserved (standard SimHash weighting)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    toks = toks.withColumn("h", F.md5("tok"))
    bits = spark.range(16).select(F.col("id").cast("int").alias("j"))
    votes = (
        toks.crossJoin(F.broadcast(bits))
        .withColumn(
            "v",
            F.expr("CASE WHEN CAST(conv(substring(h, j + 1, 1), 16, 10) AS INT) >= 8 THEN 1 ELSE -1 END"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("v").alias("s"))
    )
    fp = votes.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN s >= 0 THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END")).alias(
            "simhash16"
        )
    )
    return fp


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, md5(u.tok) AS h
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS tokens
        FROM documents), UNNEST(tokens) AS u(tok)
),
votes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN CAST('0x' || substring(h, j + 1, 1) AS INT) >= 8 THEN 1 ELSE -1 END) AS s
  FROM toks, UNNEST(generate_series(0, 15)) AS g(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       SUM(CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash16
FROM votes
GROUP BY doc_id
"""
