"""Deterministic, Spark-native synthetic WAL / binlog generator.

Generates the change-event stream the engine replays: insert/update/delete
events over the ``(repo, path, commit, lang, content)`` key space, with

- **hot-repo skew**: one repo receives ~``hot_share`` of all events
  (exercises salting + AQE skew-join splitting at scale),
- **out-of-order commits within a batch**: commit sequence jitters a few
  positions around offset order (exercises the LWW window),
- **equal-commit same-key collisions**: deliberate ties broken by offset
  (the BASELINE total order is ``(commit, event offset)``),
- **unicode + trailing-whitespace content** (exercises normalization and
  the sha256 parity invariant),
- and **no randomness**: every column derives from ``xxhash64(id, seed)``,
  so the same (n, seed, ...) always yields byte-identical logs at any
  parallelism. Generation is ``spark.range`` + column expressions — it
  scales to 10^10 events without driver involvement.

Reference analog: the time-windowed employment change feed
(``src/sd_client.py:211-253``) and its 24h sliding pull window
(``src/jobs/sd_delta.py:31-32``) — re-expressed as an offset-ordered log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = [
    "def", "return", "class", "import", "for", "while", "if", "else",
    "lambda", "yield", "async", "await", "try", "except", "merge", "scan",
    "join", "window", "batch", "stream", "offset", "commit", "køb", "sælg",
    "år", "blåbær",
]

_EXT_LANG = {0: ("py", "python"), 1: ("java", "java"), 2: ("ts", "ts"),
             3: ("go", "go"), 4: ("md", "md"), 5: ("sql", "sql")}


def _h(seed: int, salt: int):
    """Deterministic uniform-ish long derived from the row id."""
    return F.abs(F.xxhash64(F.col("offset"), F.lit(seed), F.lit(salt)))


def generate_changelog(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_repos: int = 20,
    paths_per_repo: int = 50,
    hot_share: float = 0.3,
    num_batches: int = 4,
    p_insert: float = 0.6,
    p_update: float = 0.3,
    parallelism: int | None = None,
    content_scale: int = 1,
) -> DataFrame:
    """Return the synthetic change log as a DataFrame (CHANGE_LOG_SCHEMA).

    Ops are drawn ~ (p_insert I, p_update U, rest D) independently; replay
    semantics are upsert/delete-if-exists, so the oracle is simply "last
    event per key in (commit, offset) order decides the final row".
    """
    df = spark.range(0, n_events, 1, parallelism or spark.sparkContext.defaultParallelism)
    df = df.withColumnRenamed("id", "offset")

    # --- key assignment with hot-repo skew ---------------------------------
    hot_cut = int(hot_share * 1000)
    is_hot = (_h(seed, 1) % 1000) < F.lit(hot_cut)
    repo_idx = F.when(is_hot, F.lit(0)).otherwise((_h(seed, 2) % F.lit(max(n_repos - 1, 1))) + 1)
    # hot repo gets a larger path space so its bucket has many distinct keys
    hot_paths = paths_per_repo * 4
    path_idx = F.when(is_hot, _h(seed, 3) % F.lit(hot_paths)).otherwise(_h(seed, 3) % F.lit(paths_per_repo))
    ext_idx = (_h(seed, 4) % F.lit(len(_EXT_LANG))).cast("int")

    ext_map = F.create_map(*[x for k, (ext, _) in _EXT_LANG.items() for x in (F.lit(k), F.lit(ext))])
    lang_map = F.create_map(*[x for k, (_, lg) in _EXT_LANG.items() for x in (F.lit(k), F.lit(lg))])

    df = df.withColumn("repo", F.concat(F.lit("org/repo-"), F.lpad(repo_idx.cast("string"), 4, "0")))
    df = df.withColumn(
        "path",
        F.concat(
            F.lit("src/dir"), (path_idx % 7).cast("string"), F.lit("/file"),
            path_idx.cast("string"), F.lit("."), ext_map[ext_idx],
        ),
    )
    df = df.withColumn("lang", lang_map[ext_idx])

    # --- op mix -------------------------------------------------------------
    op_draw = _h(seed, 5) % 1000
    i_cut, u_cut = int(p_insert * 1000), int((p_insert + p_update) * 1000)
    df = df.withColumn(
        "op",
        F.when(op_draw < i_cut, F.lit("I")).when(op_draw < u_cut, F.lit("U")).otherwise(F.lit("D")),
    )

    # --- commit: offset order with +/-3 jitter, occasional exact ties -------
    jitter = (_h(seed, 6) % 7) - F.lit(3)
    commit_seq = F.greatest(F.col("offset") + jitter, F.lit(0))
    # ~5% of events share a commit with a neighbor (tie-break-by-offset test)
    commit_seq = F.when(_h(seed, 7) % 20 == 0, F.col("offset") - (F.col("offset") % 2)).otherwise(commit_seq)
    # the hash suffix must derive from commit_seq, NOT the offset: a
    # per-offset suffix makes every commit string unique, so the ~5%
    # deliberate same-commit ties above would never materialize and the
    # engine's (commit, offset) tie-break branch would go unexercised
    # by every bench/parity run built on this generator
    commit_suffix = F.abs(F.xxhash64(commit_seq, F.lit(seed), F.lit(8)))
    df = df.withColumn(
        "commit",
        F.concat(F.lpad(commit_seq.cast("string"), 12, "0"), F.lit("-"),
                 F.lower(F.hex(commit_suffix % F.lit(16**7)))),
    )

    # --- content: deterministic pseudo-code, 50-2000 chars, unicode + messy
    #     whitespace (CRLF, trailing blanks) to exercise normalization ------
    words = F.array(*[F.lit(w) for w in _WORDS])
    w1 = words[(_h(seed, 9) % len(_WORDS)).cast("int")]
    w2 = words[(_h(seed, 10) % len(_WORDS)).cast("int")]
    w3 = words[(_h(seed, 11) % len(_WORDS)).cast("int")]
    line = F.concat(w1, F.lit(" "), w2, F.lit("("), w3, F.lit(", æøå_"),
                    (_h(seed, 12) % 100).cast("string"), F.lit(")"))
    trailer = F.when(_h(seed, 13) % 3 == 0, F.lit("  \r\n")).otherwise(F.lit("\n"))
    # content_scale multiplies the line count (default ~430 B/file;
    # scale 4 ~ 1.7 KB — representative of real source files) without
    # changing keys, ordering, or any other semantics
    n_lines = ((_h(seed, 14) % 30 + 2) * content_scale).cast("int")
    body = F.concat(
        F.lit("# module "), F.col("path"), F.lit("\n"),
        F.repeat(F.concat(line, trailer), n_lines),
    )
    df = df.withColumn("content", F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(body))

    # --- micro-batch assignment ---------------------------------------------
    batch_size = max(1, -(-n_events // num_batches))
    df = df.withColumn("batch_id", (F.col("offset") / F.lit(batch_size)).cast("int"))

    return df.select("offset", "op", "repo", "path", "commit", "lang", "content", "batch_id")
