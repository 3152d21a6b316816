"""Distributed connected components over an edge DataFrame.

Pipeline infrastructure for near-dup clustering (no reference analog —
the reference is a single-process pandas ETL; this is what folding
pair-level dedup output into keep/drop decisions requires at corpus
scale). Two algorithms, one contract:

- ``propagation`` — min-label propagation: each round every vertex
  takes the min label among itself and its neighbors; one shuffle join
  + one map-side-combined min aggregate per round. Rounds = component
  diameter, which is tiny for VERIFIED near-dup components (members
  pair with most other members), so this is the default fast path.
- ``star`` — alternating large-star / small-star contraction (Kiveris
  et al., "Connected Components in MapReduce and Beyond", SoCC'14):
  converges in O(log^2 n) rounds REGARDLESS of diameter, with the same
  bounded per-round join shape. The extreme-scale / adversarial-shape
  path (chains, meshes) where propagation's diameter bound fails.
- ``auto`` — propagation first; if it hits its round bound, rerun the
  input through star contraction instead of failing.

Every loop shuffle is sized with EXPLICIT ``repartition`` on the loop
frames (never by mutating ``spark.sql.shuffle.partitions`` — session
conf is shared state and the engine overlaps jobs on threads). Loop
frames are pair-graph-sized: documents that appear in at least one
near-dup pair, normally orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

# propagation rounds = component diameter; verified near-dup components
# are dense so diameters are tiny. Star contraction needs O(log^2 n):
# 40 rounds covers any graph that fits on Earth.
MAX_PROPAGATION_ROUNDS = 20
MAX_STAR_ROUNDS = 40


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    algorithm: str = "auto",
    max_rounds: int | None = None,
) -> DataFrame:
    """Label every vertex of the undirected graph ``pairs`` with the
    smallest vertex id in its component.

    Returns a DataFrame ``(vertex, component)`` covering every vertex
    that appears in at least one pair. Vertex ids must be orderable;
    ``propagation`` additionally requires them numeric (its convergence
    check sums labels) — non-numeric ids are routed to star contraction
    under ``auto`` and rejected with TypeError under ``propagation``.

    ``algorithm``: ``"propagation"`` | ``"star"`` | ``"auto"`` (try
    propagation, fall back to star contraction on non-convergence).
    """
    if algorithm not in ("auto", "propagation", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    pairs = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")
    )
    n_pairs = pairs.persist().count()
    if n_pairs == 0:
        pairs.unpersist()
        return pairs.select(
            F.col("u").alias("vertex"), F.col("v").alias("component")
        ).limit(0)
    # one loop partition per ~100k vertices (pairs bounds vertices at
    # 2x), capped at the session width — the loop frames are pair-graph
    # sized and full-width shuffles on a few hundred rows pay pure task
    # overhead every round
    sess_parts = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(1, min(sess_parts, -(-2 * n_pairs // 100_000)))
    # propagation's convergence test sums labels: a non-numeric vertex
    # type (UUID strings, ...) casts to NULL, both sums come back NULL,
    # and NULL == NULL would declare convergence after one round —
    # silently wrong for any diameter > 1 component. Route such graphs
    # straight to star contraction, whose multiset checksum works for
    # any orderable type; 'propagation' explicitly requested → refuse.
    numeric_ids = all(
        isinstance(pairs.schema[c].dataType, NumericType) for c in ("u", "v")
    )
    try:
        if not numeric_ids:
            if algorithm == "propagation":
                raise TypeError(
                    "algorithm='propagation' requires numeric vertex ids "
                    f"(got {pairs.schema['u'].dataType.simpleString()}/"
                    f"{pairs.schema['v'].dataType.simpleString()}) — its "
                    "convergence check sums labels; use 'star' or 'auto'"
                )
            return _star_contraction(pairs, loop_parts, max_rounds or MAX_STAR_ROUNDS)
        if algorithm in ("auto", "propagation"):
            rounds = max_rounds or MAX_PROPAGATION_ROUNDS
            out = _propagate(pairs, loop_parts, rounds)
            if out is not None:
                return out
            if algorithm == "propagation":
                raise RuntimeError(
                    f"label propagation did not converge in {rounds} rounds — "
                    "component diameter exceeds the bound; use algorithm='star'"
                )
            # auto-mode rescue: the caller's max_rounds bounded the
            # PROPAGATION attempt; re-using it here would let a small
            # bound spuriously fail the exact diameter-independent path
            # this fallback exists to provide — star gets its own
            # default (O(log^2 n) rounds covers any graph that fits)
            return _star_contraction(pairs, loop_parts, MAX_STAR_ROUNDS)
        return _star_contraction(pairs, loop_parts, max_rounds or MAX_STAR_ROUNDS)
    finally:
        pairs.unpersist()


def _propagate(pairs: DataFrame, loop_parts: int, max_rounds: int) -> DataFrame | None:
    """Min-label propagation; None on non-convergence (caller decides)."""
    edges = (
        pairs.unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(loop_parts, "v")
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .repartition(loop_parts, "vertex")
        .persist()
    )
    # convergence check: labels only ever DECREASE (min of self and
    # neighbors), so the label sum strictly decreases on any change and
    # is stationary exactly at convergence — one aggregate per round
    # instead of a self-join diff (decimal sum: overflow-proof for any
    # bigint ids)
    label_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges["v"] == labels["vertex"])
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        # localCheckpoint, not persist: each round references the prior
        # labels frame TWICE (inside neigh and in the join), so an
        # uncut logical plan doubles per round — the cache short-circuits
        # execution but the analyzer still walks 2^rounds plan nodes.
        # Checkpointing truncates lineage to the materialized partitions
        # (loop frames are pair-graph-sized, executor memory is fine).
        new_labels = (
            labels.join(neigh, labels["vertex"] == neigh["u"], "left")
            .select(
                labels["vertex"],
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .repartition(loop_parts, "vertex")
            .localCheckpoint()
        )
        new_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        labels.unpersist()
        labels = new_labels
        if new_sum == label_sum:
            edges.unpersist()
            return labels.select("vertex", "component")
        label_sum = new_sum
    edges.unpersist()
    labels.unpersist()
    return None


def _star_contraction(pairs: DataFrame, loop_parts: int, max_rounds: int) -> DataFrame:
    """Alternating large-star / small-star (Kiveris et al., SoCC'14).

    large-star: every vertex u connects its LARGER neighbors to
    m = min(N(u) ∪ {u}); small-star: every vertex u connects its
    smaller-or-equal neighbors and itself to its min neighbor. The
    fixed point is a forest of stars — every vertex adjacent to its
    component minimum — reached in O(log^2 n) alternations.

    Convergence is detected by a multiset checksum (count + decimal sum
    of xxhash64 over the canonically-oriented edge set): the fixed
    point is stable, so two consecutive equal checksums end the loop.
    Works for any orderable vertex type (no numeric requirement).
    """
    edges = pairs.repartition(loop_parts, "u").persist()
    checksum = _edge_checksum(edges)
    for _ in range(max_rounds):
        # localCheckpoint for the same reason as _propagate: each round
        # references the prior edge frame several times, so an uncut
        # plan grows exponentially with rounds
        edges_next = _small_star(
            _large_star(edges, loop_parts), loop_parts
        ).localCheckpoint()
        new_checksum = _edge_checksum(edges_next)
        edges.unpersist()
        edges = edges_next
        if new_checksum == checksum:
            # stars: every edge is (vertex, component-min); centers
            # appear only on the v side and label themselves
            labels = (
                edges.select(F.col("u").alias("vertex"), F.col("v").alias("component"))
                .unionByName(
                    edges.select(
                        F.col("v").alias("vertex"), F.col("v").alias("component")
                    )
                )
                .groupBy("vertex")
                .agg(F.min("component").alias("component"))
            )
            out = labels.persist()
            out.count()
            edges.unpersist()
            return out
        checksum = new_checksum
    edges.unpersist()
    raise RuntimeError(
        f"star contraction did not converge in {max_rounds} rounds — "
        "this bounds graphs astronomically larger than any real corpus; "
        "check the input for pathological duplicate structure"
    )


def _large_star(edges: DataFrame, loop_parts: int) -> DataFrame:
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        # distinct exchanges on (u, v) at session width; AQE coalesces
        # the tiny loop frames at runtime, so no explicit repartition
        # here — adding one would just insert a second exchange
        .distinct()
    )


def _small_star(edges: DataFrame, loop_parts: int) -> DataFrame:
    # orient every edge big -> small so each vertex's group holds its
    # smaller-or-equal neighbors only
    o = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = o.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        o.join(m, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .unionByName(m.select("u", F.col("mn").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(loop_parts, "u")
    )


def _edge_checksum(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.greatest("u", "v"), F.least("u", "v")).cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])
