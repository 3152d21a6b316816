"""End-to-end composition of the reference's flagship sd-delta job
(VERDICT r02 #4): config split (S18) -> exclusion anti-joins (J5) ->
status state machine (C2) -> dim enrichment (J9) -> LWW (C4) ->
merge with conditional delete (C3) -> run metrics (C14), asserted
against a single-pass pandas oracle implementing the reference's
semantics (``src/jobs/sd_delta.py:19-56``, ``src/sd_delta.py:78-200``).
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_spark.cdc.classify import ACTIVE_STATUSES, DELETE_STATUSES, TERMINAL_STATUSES
from etl_spark.functions.normalize import normalize_content, sha256_hex
from etl_spark.plans.sd_delta_flagship import run_sd_delta_flagship

# neutral stand-ins for the reference's EMPLOYMENT_STATUS names
STATUS_NAMES = {
    "0": "hired unpaid",
    "1": "active",
    "3": "temporarily unpaid",
    "7": "emigrated",
    "8": "resigned",
    "9": "retired",
    "S": "deleted",
}

FEED_COLUMNS = ["offset", "batch_id", "repo", "path", "commit", "lang", "content", "status"]


def _feed_rows():
    """Deterministic synthetic status-coded feed: 8 repos x 6 paths,
    ~4 events per key across 3 batches, out-of-order commits, every
    status family represented including NULL status (the reference's
    None code) and delete-then-reinsert sequences."""
    statuses = ["0", "1", "3", "7", "8", "9", "S", None]
    rows = []
    offset = 0
    for rnd in range(4):  # 4 event waves per key
        for r in range(8):
            for p in range(6):
                sidx = (r * 31 + p * 17 + rnd * 7) % len(statuses)
                commit = f"c{(offset * 37) % 97:04d}"  # out-of-order vs offset
                rows.append(
                    (
                        offset,
                        offset * 3 // ((4 * 8 * 6)),  # 3 batches
                        f"r{r}",
                        f"f{p}",
                        commit,
                        ["py", "go", "rs"][p % 3],
                        f"content {r}/{p} v{rnd} @\r\n{offset} x",
                        statuses[sidx],
                    )
                )
                offset += 1
    return rows


def _oracle(rows, excluded_repos, excluded_units, guarded_keys):
    """The reference's flagship semantics in one pandas pass."""
    df = pd.DataFrame(rows, columns=FEED_COLUMNS)
    # exclusions (src/sd_delta.py:88-91,126)
    df = df[~df["repo"].isin(excluded_repos)]
    df = df[~df.apply(lambda x: (x["repo"], x["path"]) in excluded_units, axis=1)]
    # state machine (src/sd_delta.py:106-119): has_active per key over the
    # feed; terminal codes suppressed on active keys; None never suppressed
    actives = set(ACTIVE_STATUSES)
    terminals = set(TERMINAL_STATUSES)
    dels = set(DELETE_STATUSES)
    has_active = df[df["status"].isin(actives)].groupby(["repo", "path"]).size()
    active_keys = set(has_active.index)

    def _suppressed(x):
        return (
            x["status"] in terminals
            and (x["repo"], x["path"]) in active_keys
            and x["status"] not in dels
        )

    df = df[~df.apply(_suppressed, axis=1)].copy()
    df["op"] = df["status"].map(lambda s: "D" if s in dels else "U")
    # conditional delete (src/sd_delta.py:57-72): guarded keys' deletes
    # are demoted to no-ops
    df = df[~(df.apply(lambda x: (x["repo"], x["path"]) in guarded_keys, axis=1) & (df["op"] == "D"))]
    # LWW by (commit, offset), deletes drop the key
    ordered = df.sort_values(["commit", "offset"], kind="mergesort")
    last = ordered.groupby(["repo", "path"], as_index=False).tail(1)
    final = last[last["op"] != "D"].copy()
    final["status_name"] = final["status"].map(lambda s: STATUS_NAMES.get(s) if s is not None else None)
    final["content_sha256"] = final["content"].map(
        lambda c: sha256_hex(normalize_content(c)) if c is not None else None
    )
    cols = ["repo", "path", "commit", "lang", "content", "status", "status_name", "content_sha256"]
    return final[cols].sort_values(["repo", "path"]).reset_index(drop=True)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_flagship_end_to_end(spark, tmp_path, mode):
    rows = _feed_rows()
    feed = spark.createDataFrame(
        rows,
        "offset long, batch_id int, repo string, path string, commit string, "
        "lang string, content string, status string",
    )

    # config CSV: r7 fully excluded (path='-'), unit (r2, f3) excluded;
    # untrimmed cells exercise the S18 skipinitialspace semantics
    cfg = tmp_path / "excluded.csv"
    cfg.write_text("repo; path\nr7; -\nr2; f3\n")

    status_dim = spark.createDataFrame(
        [(k, v) for k, v in STATUS_NAMES.items()], "status string, status_name string"
    )
    # (r1, f1) is "still present upstream" -> its deletes must demote
    guard = spark.createDataFrame([("r1", "f1")], "repo string, path string")

    engine, results = run_sd_delta_flagship(
        spark,
        str(tmp_path / f"tbl_{mode}"),
        feed,
        str(cfg),
        status_dim=status_dim,
        delete_guard=guard,
        mode=mode,
        num_buckets=4,
    )

    expected = _oracle(rows, {"r7"}, {("r2", "f3")}, {("r1", "f1")})
    got = (
        engine.read_state()
        .select("repo", "path", "commit", "lang", "content", "status", "status_name", "content_sha256")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected)

    # excluded units never reach the table
    assert got[(got["repo"] == "r7") | ((got["repo"] == "r2") & (got["path"] == "f3"))].empty
    # the guarded key survives even though its last event could be a delete
    assert len(got[(got["repo"] == "r1") & (got["path"] == "f1")]) == 1

    # C14: run metrics reconcile with the replay results
    m = engine.metrics().toPandas().sort_values("batch_id")
    applied = [r for r in results if not r.get("skipped")]
    assert list(m["batch_id"]) == [r["batch_id"] for r in applied]
    assert m["rows_in"].sum() == sum(r["rows_in"] for r in applied)
    # exactly-once: re-running the whole flagship is a no-op
    engine2, results2 = run_sd_delta_flagship(
        spark,
        str(tmp_path / f"tbl_{mode}"),
        feed,
        str(cfg),
        status_dim=status_dim,
        delete_guard=guard,
        mode=mode,
        num_buckets=4,
    )
    assert all(r["skipped"] for r in results2)
