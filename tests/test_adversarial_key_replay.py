"""Sweep 7, CDC path: replay over a HOSTILE KEY space — unicode repo
names (NFC and NFD variants, which are DISTINCT keys byte-wise), keys
differing only by case, keys with spaces and tabs, a 500-char path —
and assert final-state + sha256 parity against the pandas twin plus
point-lookup correctness. This drives the bucket hash, manifest shard
min/max string stats, data-skipping, and the point-read path over key
bytes the ASCII generator never produces."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.changelog import generate_changelog
from etl_spark.cdc.replay import ReplayEngine
from tests.oracle import apply_log_oracle

HOSTILE_REPOS = [
    "org/åæø-repo",
    "org/名前-リポ",
    "ORG/Case-Repo",
    "org/case-repo",  # differs from the previous only by case
    "org/café",  # NFC
    "org/café",  # NFD — a DIFFERENT key byte-wise
    "org/with space",
    "org/\U0001f980-crab",
]

HOSTILE_PATHS = [
    "src/a.py",
    "src/ÆØÅ/fil.py",
    "src/" + "deep/" * 97 + "leaf.go",  # ~500-char path
    "src/with\ttab.md",
    "SRC/A.PY",  # case variant of the first
]


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_replay_parity_on_hostile_keys(spark, tmp_path, mode):
    log = generate_changelog(
        spark, 400, seed=7, n_repos=16, paths_per_repo=10, num_batches=3
    )
    repos = F.array(*[F.lit(r) for r in HOSTILE_REPOS])
    paths = F.array(*[F.lit(p) for p in HOSTILE_PATHS])
    # deterministic remap via the generated key's own numeric index
    # (same generated key -> same hostile key, so the log keeps genuine
    # same-key update/delete chains; 16 repo indexes mod 8 and 10 path
    # indexes mod 5 cover every hostile key)
    repo_idx = F.regexp_extract("repo", r"(\d+)$", 1).cast("int")
    path_idx = F.regexp_extract("path", r"file(\d+)\.", 1).cast("int")
    log = log.withColumn(
        "repo", F.element_at(repos, (F.pmod(repo_idx, F.lit(len(HOSTILE_REPOS))) + 1).cast("int"))
    ).withColumn(
        "path", F.element_at(paths, (F.pmod(path_idx, F.lit(len(HOSTILE_PATHS))) + 1).cast("int"))
    )
    pdf = log.toPandas()
    want = apply_log_oracle(pdf)
    # corpus guards: the case pair and the NFC/NFD pair must both be
    # live keys, i.e. byte-distinct keys that a case- or
    # unicode-normalizing engine would wrongly merge
    repos_seen = set(pdf["repo"])
    assert {"ORG/Case-Repo", "org/case-repo"} <= repos_seen
    assert {"org/café", "org/café"} <= repos_seen

    eng = ReplayEngine(
        spark, str(tmp_path / f"k_{mode}"), num_buckets=4, mode=mode,
        compact_threshold=2,
    )
    eng.replay(log)
    got = (
        eng.read_state()
        .select("repo", "path", "commit", "lang", "content", "content_sha256")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))

    # point lookup over hostile key bytes: every surviving key resolves
    # to exactly its final row (drives shard stats + data skipping with
    # unicode min/max bounds); a deleted/absent key resolves to nothing
    sample = want.head(5)
    for _, row in sample.iterrows():
        hit = eng.lookup(repo=row["repo"], path=row["path"]).collect()
        assert len(hit) == 1 and hit[0]["commit"] == row["commit"]
    assert eng.lookup(repo="org/absent", path="nope.py").count() == 0
