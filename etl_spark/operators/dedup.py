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
  shingle groups; shingles with document frequency > MAX_DF are dropped
  from the index (not from the Jaccard itself) — the standard
  stop-shingle bound that keeps bucket sizes O(MAX_DF) at any corpus
  size. The oracle SQL applies the identical rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators.relational import t
from etl_spark.operators.textstats import _TOKEN_SPLIT, _tokens

N_MINHASH = 8  # 4 bands x 2 rows
N_BANDS = 4
ROWS_PER_BAND = 2
MAX_DF = 20  # stop-shingle document-frequency cap for candidate generation
# default near-dup thresholds — ALSO interpolated into the SQL oracles
# below, so builder defaults and oracle literals cannot drift; a caller
# passing a non-default threshold has no static oracle twin (same
# contract as similarity.py's EMB_* knobs)
NGRAM_THRESHOLD = 0.5
MINHASH_THRESHOLD = 0.4
MAX_BUCKET = 50  # LSH band-bucket size cap: oversized buckets are skipped
# (standard at scale: a bucket holding thousands of docs is a degenerate
# collision — pure skew, no near-dup signal; candidates it would add are
# recovered by the other bands or fail Jaccard verification anyway)


def _shingles(col, n: int = 3):
    """Word n-gram shingles as strings (distinct); empty array for docs
    shorter than n tokens.

    The token array is bound as a lambda VARIABLE (transform over a
    1-element array) so the split() runs exactly once per row — naming
    it as a plain sub-expression would inline the split at every
    element_at reference inside the inner lambda, where higher-order
    functions get no common-subexpression elimination (measured 40x
    slowdown)."""

    def _grams(toks):
        k = F.size(toks)
        return F.when(
            k >= n,
            F.transform(
                F.sequence(F.lit(0), k - n),
                # slice(toks, i+1, n): the gram width follows n — the
                # element_at form this replaces hardwired 3 tokens and
                # silently produced trigrams for any other n
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(_tokens(col)), lambda toks: F.array_distinct(_grams(toks))), 1)


def _exact_jaccard(sh_a: str, sh_b: str):
    """ROUND(|A ∩ B| / |A ∪ B|, 6) over two shingle-array columns — the
    ONE verify expression both candidate families filter on (and the
    SQL oracles mirror)."""
    return F.round(
        F.size(F.array_intersect(sh_a, sh_b)).cast("double")
        / F.size(F.array_union(sh_a, sh_b)),
        6,
    )


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


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = NGRAM_THRESHOLD) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard >= threshold.

    Candidates come from a document-frequency-capped shingle inverted
    index (a pair must share at least one shingle with df <= MAX_DF);
    Jaccard itself is exact over the FULL shingle sets via
    array_intersect/array_union on the candidates only.

    Coverage note (no silent caps): the df cap can only miss a pair
    whose EVERY shared shingle is frequent — near-identical boilerplate
    documents. Operationally, log the cap's reach with
    ``inv.groupBy("g").count().filter(F.col("count") > MAX_DF).count()``
    (dropped-shingle count) next to the candidate count; the identical
    rule runs in the oracle, so the cap never diverges the two engines.

    doc_id is canonicalized to ONE row per id (deterministic MAX(text),
    binary collation in both engines) before shingling: the
    intersection upper bound below assumes per-doc shingle counts are
    counted once — duplicate doc_id rows (a routine CDC-feed artifact)
    double n_rare while n_sh stays per-row, driving n_freq negative and
    turning the "upper bound" into an UNDER-estimate that silently
    drops true pairs. One map-side-combinable agg; a no-op shuffle-wise
    next to the shingle explode and array-verify join that follow."""
    docs = (
        t(spark, sf_dir, "documents")
        .groupBy("doc_id")
        .agg(F.max("text").alias("text"))
    )
    d = docs.select("doc_id", _shingles(F.col("text")).alias("sh"))
    d = d.filter(F.size("sh") > 0).cache()
    inv = d.select("doc_id", F.explode("sh").alias("g"))
    rare = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= MAX_DF)
    inv = inv.join(rare.select("g"), "g")

    # per-doc totals: how many shingles, how many survived the df cap —
    # lets us bound the TRUE intersection from the rare-only join below
    nrare = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_rare"))
    meta = (
        d.select("doc_id", F.size("sh").alias("n_sh"))
        .join(nrare, "doc_id", "left")
        .na.fill({"n_rare": 0})
        .withColumn("n_freq", F.col("n_sh") - F.col("n_rare"))
    )

    # candidate stats in ONE aggregation (no distinct): c_rare = common
    # rare shingles. True common c satisfies c <= c_rare + min(freq_a,
    # freq_b), and jaccard is monotone in c, so pairs whose UPPER BOUND
    # misses the threshold are pruned exactly — array verification only
    # touches the survivors (orders of magnitude fewer at scale).
    a, b = inv.alias("a"), inv.alias("b")
    pair_stats = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c_rare"))
    )
    ma = meta.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"), F.col("n_freq").alias("f_a"))
    mb = meta.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"), F.col("n_freq").alias("f_b"))
    c_upper = F.col("c_rare") + F.least(F.col("f_a"), F.col("f_b"))
    jac_upper = c_upper.cast("double") / (F.col("n_a") + F.col("n_b") - c_upper)
    survivors = (
        pair_stats.join(ma, "doc_a")
        .join(mb, "doc_b")
        # margin = one 6-dp rounding step: the final filter (and the
        # oracle) compare ROUND(jaccard, 6) >= threshold, so a tight
        # upper bound (c_upper == c) at threshold - 5e-7 must survive
        # the prune for the verify stage to decide it
        .filter(jac_upper >= threshold - 1e-6)
        .select("doc_a", "doc_b")
    )

    sa = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = _exact_jaccard("sh_a", "sh_b")
    return (
        survivors.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


NGRAM_JACCARD_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         )) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS toks
        FROM (SELECT doc_id, MAX(text) AS text FROM documents GROUP BY doc_id))
),
inv AS (
  SELECT doc_id, u.g
  FROM docs, UNNEST(sh) AS u(g)
  WHERE len(sh) > 0
),
rare AS (
  SELECT g FROM inv GROUP BY g HAVING COUNT(*) <= {MAX_DF}
),
inv2 AS (
  SELECT inv.doc_id, inv.g FROM inv JOIN rare USING (g)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM inv2 a JOIN inv2 b ON a.g = b.g AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c JOIN docs sa ON sa.doc_id = c.doc_a JOIN docs sb ON sb.doc_id = c.doc_b
WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= {NGRAM_THRESHOLD}
"""


def _minhash_base(d, col):
    """(doc_id, sh, mh0..mhN) with the shingle array computed ONCE per row
    (struct-packed signatures so top-level subexpression elimination
    applies; see _shingles for why that matters).

    MinHash rule: per seed s, min over shingles of md5(s || '|' || g).
    String-min keeps Spark/DuckDB identical."""

    def _sig_struct(shv):
        # seed literal built OUTSIDE the lambda: a default-arg closure
        # (lambda g, s=s: ...) declares TWO parameters, and PySpark calls
        # the callback with a positional Column for EVERY declared
        # parameter (transform's second arg is the element index) — the
        # default is overridden and f"{s}|" stringifies the index Column
        # into the literal ("Column<'y_2'>|..."), silently replacing all
        # N seeds with construction-order-dependent strings. The banding
        # still "works" (any seed family does, probabilistically) but no
        # longer matches the documented 0|..7| rule the oracle computes.
        def _min_for(s: int):
            prefix = F.lit(f"{s}|")
            return F.array_min(
                F.transform(shv, lambda g: F.md5(F.concat(prefix, g)))
            ).alias(f"mh{s}")

        return F.struct(*[_min_for(s) for s in range(N_MINHASH)])

    base = d.select("doc_id", _shingles(col).alias("sh"))
    base = base.select(
        "doc_id",
        "sh",
        F.element_at(F.transform(F.array(F.col("sh")), _sig_struct), 1).alias("sig"),
    )
    return base.select("doc_id", "sh", "sig.*")


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      threshold: float = MINHASH_THRESHOLD) -> DataFrame:
    """MinHash+LSH near-dup candidates -> exact Jaccard verify.

    Banding: {N_BANDS} bands x {ROWS_PER_BAND} rows; candidates collide on
    at least one full band. Verification recomputes exact shingle Jaccard
    on candidates only — the scalable two-phase shape."""
    d = t(spark, sf_dir, "documents")
    base = _minhash_base(d, F.col("text")).filter(F.size("sh") > 0).cache()

    bands = []
    for b in range(N_BANDS):
        key = F.concat_ws("#", *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)])
        bands.append(base.select("doc_id", F.lit(b).alias("band"), key.alias("bkey")))
    allbands = bands[0]
    for x in bands[1:]:
        allbands = allbands.unionByName(x)

    # hot-bucket skip: bound the within-bucket self-join at O(MAX_BUCKET^2)
    small = (
        allbands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= MAX_BUCKET)
        .select("band", "bkey")
    )
    allbands = allbands.join(small, ["band", "bkey"])

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
        .select("doc_a", "doc_b", _exact_jaccard("sh_a", "sh_b").alias("jaccard"))
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
small AS (
  SELECT band, bkey FROM bands GROUP BY band, bkey HAVING COUNT(*) <= {MAX_BUCKET}
),
bands2 AS (
  SELECT bands.* FROM bands JOIN small USING (band, bkey)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands2 a JOIN bands2 b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a JOIN sigs sb ON sb.doc_id = c.doc_b
WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= {MINHASH_THRESHOLD}
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per bit j, majority vote over tokens of the high
    bit of md5 hex digit j; fingerprint packs the 16 votes. Token
    multiplicity preserved (standard SimHash weighting).

    Plan: ONE projection emits all 16 +/-1 votes per token (16 narrow int
    columns, no crossJoin row blowup), ONE hash aggregation sums them
    per doc (map-side combine collapses to one partial row per doc per
    partition before the only exchange), then a scalar projection packs
    the fingerprint. At 100 TB: shuffle volume is ~72 bytes/doc, not
    16x the token stream as a bit-table crossJoin would make it."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok")).select(
        "doc_id", F.md5("tok").alias("h")
    )
    votes = toks.select(
        "doc_id",
        *[
            F.when(F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int") >= 8, 1)
            .otherwise(-1)
            .alias(f"v{j}")
            for j in range(16)
        ],
    )
    sums = votes.groupBy("doc_id").agg(*[F.sum(f"v{j}").alias(f"s{j}") for j in range(16)])
    packed = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        packed = term if packed is None else packed + term
    # final dtype is a plain BIGINT projection (not SUM->HUGEINT) so the
    # driver hash sees int64 on both engines
    return sums.select("doc_id", packed.cast("bigint").alias("simhash16"))


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
       CAST(SUM(CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash16
FROM votes
GROUP BY doc_id
"""


def near_dup_clusters(
    spark: SparkSession, sf_dir: str,
    threshold: float = MINHASH_THRESHOLD, algorithm: str = "auto"
) -> DataFrame:
    """Connected components over the verified MinHash-LSH near-dup graph
    (``minhash_lsh_pairs``): every document appearing in at least one
    pair gets ``cluster_id`` = the smallest ``doc_id`` in its component.

    A training-data pipeline consumes PAIRS poorly — dedup keeps ONE
    canonical doc per duplicate CLUSTER, so pairs must be folded into
    components first (reference analog: none; this is pipeline
    infrastructure the pair ops imply). Component labelling lives in
    :mod:`etl_spark.operators.graph`: min-label propagation by default
    (rounds = component diameter, tiny for verified near-dup
    components), falling back to alternating star contraction — the
    O(log^2 n)-round, diameter-independent extreme-scale path — on
    non-convergence, or directly via ``algorithm="star"``."""
    from etl_spark.operators.graph import connected_components

    # connected_components persists the pair frame for the duration of
    # its loop — without that, every round would rerun the whole
    # minhash+verify computation
    pairs = minhash_lsh_pairs(spark, sf_dir, threshold).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b", algorithm=algorithm)
    return labels.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


NEAR_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_SQL}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT s AS doc_id, d AS r FROM edges
  UNION
  SELECT reach.doc_id, e.d FROM reach JOIN edges e ON reach.r = e.s
)
SELECT doc_id, LEAST(doc_id, MIN(r)) AS cluster_id
FROM reach
GROUP BY doc_id
"""


def dedup_keep_canonical(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = MINHASH_THRESHOLD,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """The consumer-facing dedup result: one canonical document per
    near-dup cluster (the cluster's min ``doc_id``), singletons kept
    as-is, each with its ``cluster_size``. This is the row set a
    training pipeline actually feeds downstream after
    ``near_dup_clusters``; the corpus-sized side joins the (small)
    cluster map, so the only wide operation is one count aggregation.

    ``clusters`` (columns ``doc_id``, ``cluster_id``) lets a pipeline
    that already ran ``near_dup_clusters`` reuse the computed labels —
    then this is one join + one aggregation. Omitted, it computes the
    clusters itself (the self-contained catalog contract)."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    if clusters is None:
        clusters = near_dup_clusters(spark, sf_dir, threshold)
    labeled = docs.join(clusters, "doc_id", "left").select(
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id")
    )
    return (
        labeled.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("cluster_id").alias("doc_id"), "cluster_size")
    )


DEDUP_KEEP_CANONICAL_SQL = f"""
WITH clusters AS ({NEAR_DUP_CLUSTERS_SQL}),
labeled AS (
  SELECT COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
)
SELECT cluster_id AS doc_id, COUNT(*) AS cluster_size
FROM labeled
GROUP BY cluster_id
"""


# line document-frequency above which a line is corpus boilerplate
# (headers, navbars, license blocks — repeated across many documents)
BOILERPLATE_MAX_DF = 10

# The synthetic documents table carries newline-free text, so the entry
# composes a deterministic line-structured page per document (shared
# nav + footer lines, a per-source header, the unique body) before
# stripping — the algorithm under test is the strip, and the page
# construction is mirrored verbatim in the oracle.
_PAGE_NAV = "home | products | docs | contact"
_PAGE_FOOTER = "(c) example corp - all rights reserved"


def boilerplate_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: strip lines that repeat across more than
    ``BOILERPLATE_MAX_DF`` documents (the paragraph/line-level
    boilerplate-removal stage of a training-data pipeline — real corpora
    shed repeated headers, navigation bars, and license blocks that
    doc-level dedup cannot touch).

    Scale shape (100 TB-safe): ``posexplode`` lines -> one map-side-
    combined distinct-doc count per normalized line (shuffles line
    hashes, never documents) -> left-anti join of lines against the
    boilerplate set, bucketed by line hash -> per-document reassembly
    via one groupBy ordered by line position. No all-pairs stage, no
    driver-side loop; every shuffle key is a line hash or doc_id.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit(_PAGE_NAV),
            F.concat(F.lit("section: "), F.col("source")),
            F.col("text"),
            F.lit(_PAGE_FOOTER),
        ).alias("page"),
    )
    lines = docs.select(
        "doc_id", F.posexplode(F.split("page", "\n")).alias("pos", "line")
    ).withColumn("norm", F.trim("line"))
    boiler = (
        lines.where(F.length("norm") > 0)
        .groupBy("norm")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") > BOILERPLATE_MAX_DF)
        .select("norm")
    )
    kept = lines.join(boiler, "norm", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("content_clean"),
        F.count(F.lit(1)).alias("lines_kept"),
    )
    # total over documents: a fully-boilerplate page must still come back
    # (empty), not vanish from the corpus
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("content_clean", F.lit("")).alias("content_clean"),
        F.coalesce("lines_kept", F.lit(0).cast("long")).alias("lines_kept"),
    )


BOILERPLATE_LINE_DEDUP_SQL = f"""
WITH pages AS (
  -- concat_ws, not ||: both engines SKIP null parts (a NULL text must
  -- yield the 3-line page, not a NULL page that vanishes from lines)
  SELECT doc_id,
         concat_ws(chr(10),
                   '{_PAGE_NAV}',
                   'section: ' || source,
                   text,
                   '{_PAGE_FOOTER}') AS page
  FROM documents
),
lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(page, chr(10)), 1) AS pos,
         unnest(string_split(page, chr(10))) AS line
  FROM pages
),
norm AS (SELECT doc_id, pos, line, trim(line) AS norm FROM lines),
boiler AS (
  SELECT norm FROM norm WHERE length(norm) > 0
  GROUP BY norm HAVING COUNT(DISTINCT doc_id) > {BOILERPLATE_MAX_DF}
),
kept AS (
  SELECT n.doc_id, n.pos, n.line
  FROM norm n ANTI JOIN boiler b ON n.norm = b.norm
),
rebuilt AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS content_clean,
         COUNT(*) AS lines_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r.content_clean, '') AS content_clean,
       COALESCE(r.lines_kept, 0) AS lines_kept
FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


# --- benchmark decontamination -------------------------------------------
# distinct shared word-3-gram shingles at or above which a training
# document is flagged as contaminated by the eval/benchmark set
DECONTAM_MIN_SHARED = 3
# the self-contained eval-set rule: every 50th doc_id role-plays as the
# held-out benchmark (a caller supplies its real eval frame instead)
_DECONTAM_EVAL_MOD = 50


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    eval_docs: DataFrame | None = None,
    min_shared: int = DECONTAM_MIN_SHARED,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share at
    least ``min_shared`` DISTINCT word-3-gram shingles with a held-out
    eval set — the stage that keeps test data out of a training corpus
    (doc-level near-dup cannot do this: a training page quoting one
    eval question is far below any whole-document similarity
    threshold).

    Scale shape (100 TB-safe): the eval side is small by definition, so
    its distinct shingle set is BROADCAST — the training corpus streams
    through one map-side hash-semi-join on the shingle (no shuffle of
    content, no all-pairs), then one map-side-combined distinct count
    per doc_id. With ``eval_docs=None`` a deterministic slice of the
    documents table (doc_id % 50 == 0) role-plays as the benchmark so
    the operator is self-contained for tests/benchmarks; production
    callers pass their real eval frame (eval_id, text).
    """
    d = t(spark, sf_dir, "documents")
    if eval_docs is None:
        eval_docs = d.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0).select(
            F.col("doc_id").alias("eval_id"), "text"
        )
        train = d.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
    else:
        train = d
    eval_sh = (
        eval_docs.select(F.explode(_shingles(F.col("text"))).alias("g")).distinct()
    )
    train_sh = train.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("g")
    )
    shared = (
        train_sh.join(F.broadcast(eval_sh), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))  # shingles are distinct per doc
    )
    return (
        train.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         )) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS toks
        FROM documents)
),
eval_sh AS (
  SELECT DISTINCT u.g FROM shingled, UNNEST(sh) AS u(g)
  WHERE doc_id % {_DECONTAM_EVAL_MOD} = 0
),
train_sh AS (
  SELECT doc_id, u.g FROM shingled, UNNEST(sh) AS u(g)
  WHERE doc_id % {_DECONTAM_EVAL_MOD} <> 0
),
shared AS (
  SELECT doc_id, COUNT(*) AS n_shared
  FROM train_sh JOIN eval_sh USING (g)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_shared, 0) AS n_shared,
       COALESCE(s.n_shared, 0) >= {DECONTAM_MIN_SHARED} AS contaminated
FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
WHERE d.doc_id % {_DECONTAM_EVAL_MOD} <> 0
"""
