"""Connected components: label propagation vs star contraction vs a
pure-Python union-find oracle, including the >20-diameter chain that
exceeds the propagation round bound (the case star contraction exists
for)."""

import random

import pytest

from etl_spark.operators.graph import (
    MAX_PROPAGATION_ROUNDS,
    connected_components,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _labels(df):
    return {r["vertex"]: r["component"] for r in df.collect()}


def _pairs_df(spark, pairs, typ="bigint"):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], f"doc_a {typ}, doc_b {typ}"
    )


@pytest.mark.parametrize("seed", [1, 7, 42])
@pytest.mark.parametrize("algorithm", ["propagation", "star"])
def test_random_graphs_match_union_find(spark, seed, algorithm):
    rng = random.Random(seed)
    n = 120
    pairs = {
        tuple(sorted(rng.sample(range(n), 2)))
        for _ in range(90)
    }
    pairs = sorted(pairs)
    got = _labels(
        connected_components(_pairs_df(spark, pairs), algorithm=algorithm)
    )
    assert got == _union_find(pairs)


def test_long_chain_exceeds_propagation_bound(spark):
    # a chain of diameter 30 > MAX_PROPAGATION_ROUNDS: pure propagation
    # refuses, star solves it, auto falls back to star and solves it
    assert MAX_PROPAGATION_ROUNDS < 30
    chain = [(i, i + 1) for i in range(30)]
    df = _pairs_df(spark, chain)

    with pytest.raises(RuntimeError, match="star"):
        connected_components(df, algorithm="propagation")

    want = {v: 0 for v in range(31)}
    assert _labels(connected_components(df, algorithm="star")) == want
    assert _labels(connected_components(df, algorithm="auto")) == want


def test_star_handles_string_vertices(spark):
    # star's checksum convergence works for any orderable type —
    # propagation needs numeric labels for its sum check
    pairs = [("b", "a"), ("c", "b"), ("x", "y")]
    got = _labels(connected_components(_pairs_df(spark, pairs, "string"), algorithm="star"))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_auto_routes_string_vertices_to_star(spark):
    # the advisor's trap: propagation's label-sum convergence check casts
    # to decimal → NULL for string ids → NULL == NULL declared convergence
    # after one round. 'auto' must bypass propagation entirely for
    # non-numeric ids; diameter-3 chain catches the one-round wrong answer.
    pairs = [("b", "a"), ("c", "b"), ("d", "c")]
    got = _labels(
        connected_components(_pairs_df(spark, pairs, "string"), algorithm="auto")
    )
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_propagation_rejects_string_vertices(spark):
    pairs = [("b", "a"), ("c", "b")]
    with pytest.raises(TypeError, match="numeric"):
        connected_components(
            _pairs_df(spark, pairs, "string"), algorithm="propagation"
        )


def test_empty_input(spark):
    df = _pairs_df(spark, []).limit(0)
    assert connected_components(df, algorithm="auto").count() == 0


def test_self_loops_ignored(spark):
    pairs = [(1, 1), (1, 2), (3, 3)]
    got = _labels(connected_components(_pairs_df(spark, pairs), algorithm="star"))
    # vertex 3 only appears in a self-loop: it is not in any real pair,
    # so it is absent from the output (singleton handling is the
    # caller's contract, as in dedup_keep_canonical)
    assert got == {1: 1, 2: 1}
