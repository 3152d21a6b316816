"""Sixth review sweep: data-skipping soundness under Spark float
semantics, and integer-exact trend-fit sums.

The pruning property here is the one every lake format's planner must
hold: if the footer-derived [min, max] claims no row can satisfy a
predicate, then truly no row satisfies it UNDER THE ENGINE'S comparison
semantics — for Spark that includes NaN ordering above every double and
NaN = NaN being true, while parquet writers EXCLUDE NaN from footer
min/max (the mismatch Iceberg tracks nan_value_counts for).
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_spark.operators.grouped import _fit_trend, _round6
from etl_spark.table.stats import collect_dir_stats, entry_excludes

# ---------- Spark comparison semantics model ----------


def _isnan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _eq(a, b) -> bool:
    """Spark equality: NaN = NaN is true (unlike IEEE)."""
    if _isnan(a) or _isnan(b):
        return _isnan(a) and _isnan(b)
    return a == b


def _lt(a, b) -> bool:
    """Spark ordering: NaN sorts above every other double."""
    if _isnan(a):
        return False
    if _isnan(b):
        return True
    return a < b


def _satisfies(x, op: str, val) -> bool:
    """Does row value ``x`` satisfy ``x op val`` under Spark semantics?
    NULL never satisfies (null-rejecting predicates)."""
    if x is None:
        return False
    if op == "in":
        return any(_eq(x, v) for v in val)
    if op == "=":
        return _eq(x, val)
    if op == "<":
        return _lt(x, val)
    if op == "<=":
        return _lt(x, val) or _eq(x, val)
    if op == ">":
        return _lt(val, x)
    if op == ">=":
        return _lt(val, x) or _eq(x, val)
    raise AssertionError(op)


# ---------- strategies ----------

_INTS = st.integers(min_value=-(2**40), max_value=2**40)
_FLOATS = st.floats(allow_nan=True, allow_infinity=True, width=64)
# long strings exercise the MAX_STAT_LEN drop and the writer's own
# statistics-size handling; text() excludes surrogates by default
_TEXTS = st.text(max_size=600)
_ARROW_TYPES = {"int": pa.int64(), "float": pa.float64(), "str": pa.string()}
_OPS = st.sampled_from(["=", "<", "<=", ">", ">=", "in"])


@st.composite
def _pruning_case(draw):
    tag = draw(st.sampled_from(["int", "float", "str"]))
    base = {"int": _INTS, "float": _FLOATS, "str": _TEXTS}[tag]
    vals = draw(st.lists(st.one_of(st.none(), base), max_size=20))
    n_files = draw(st.integers(min_value=1, max_value=3))
    preds = draw(
        st.lists(st.tuples(_OPS, st.lists(base, min_size=1, max_size=3)),
                 min_size=1, max_size=4)
    )
    return tag, vals, n_files, preds


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_pruning_case())
def test_footer_stats_pruning_is_sound(case):
    """entry_excludes over real parquet footer stats never prunes a file
    set containing a row that satisfies the predicate under Spark
    comparison semantics — across ints, doubles (NaN/inf/signed zero),
    unicode strings (incl. over-long bounds), NULLs, multi-file dirs,
    and all-null / empty files."""
    tag, vals, n_files, preds = case
    d = tempfile.mkdtemp(prefix="stats_prop_")
    try:
        chunk = max(1, -(-len(vals) // n_files))
        pieces = [vals[i : i + chunk] for i in range(0, len(vals), chunk)] or [[]]
        for i, piece in enumerate(pieces):
            t = pa.table({"v": pa.array(piece, type=_ARROW_TYPES[tag])})
            pq.write_table(t, os.path.join(d, f"f{i}.parquet"))
        out = collect_dir_stats(d, ["v"])
        assert out["rows"] == len(vals)
        col = out["stats"].get("v")
        for op, pvals in preds:
            val = pvals if op == "in" else pvals[0]
            if entry_excludes(col, op, val):
                hits = [x for x in vals if _satisfies(x, op, val)]
                assert not hits, (
                    f"pruned {op} {val!r} but rows {hits!r} satisfy it "
                    f"(recorded stats {col!r})"
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_entry_excludes_float_bounds_are_nan_safe():
    """Float bounds use lower-bound rules only: parquet min/max exclude
    NaN, and Spark orders NaN above max — so upper-bound pruning on a
    double column could drop a NaN row the scan must return."""
    stf = {"min": 1.0, "max": 20.0, "nulls": 0}
    assert entry_excludes(stf, "<", 1.0)
    assert entry_excludes(stf, "<=", 0.5)
    assert entry_excludes(stf, "=", 0.5)
    assert entry_excludes(stf, "in", [0.5, 0.75])
    for op in (">", ">="):
        assert not entry_excludes(stf, op, 100.0)
    assert not entry_excludes(stf, "=", 100.0)
    assert not entry_excludes(stf, "in", [100.0])
    # a NaN probe value can never prove exclusion either way
    assert not entry_excludes(stf, "=", float("nan"))
    # integer bounds keep full two-sided pruning
    sti = {"min": 10, "max": 20, "nulls": 0}
    assert entry_excludes(sti, ">", 20) and entry_excludes(sti, "=", 21)


def test_join_asof_null_ts_signup_matches_oracle(spark, tmp_path):
    """A user whose ONLY signups carry NULL timestamps must yield a NULL
    as-of id, exactly like the oracle's null-rejecting WHERE — the old
    `isNull() |` filter branch admitted the NULL-ts signup as a
    qualifying candidate and returned its id from Spark while DuckDB
    returned NULL (unexercised by the sweep-5 corpus, whose NULL-ts
    signup user had no purchase)."""
    import duckdb

    from etl_spark.operators.relational import JOIN_ASOF_SQL, join_asof

    pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4, 5], dtype="Int64"),
            "ts": pd.to_datetime(
                [None, "2024-01-02 10:00", "2024-01-01 09:00",
                 "2024-01-02 11:00", None]
            ).astype("datetime64[us]"),
            "user_id": pd.array([7, 7, 8, 8, 9], dtype="Int64"),
            # user 7: purchase with only a NULL-ts signup -> asof NULL
            # user 8: purchase with a real prior signup -> asof 3
            # user 9: NULL-ts purchase (bound never satisfied) -> NULL
            "event_type": ["signup", "purchase", "signup", "purchase", "purchase"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            "props": [None] * 5,
        }
    ).to_parquet(tmp_path / "events.parquet", index=False)

    got = {
        r["purchase_id"]: r["asof_signup_id"]
        for r in join_asof(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        want = {
            r[0]: r[3] for r in con.execute(JOIN_ASOF_SQL).fetchall()
        }
    finally:
        con.close()
    assert got == want == {2: None, 4: 3, 5: None}


def _classify_model(rows, existing, dels, actives, terminals):
    """Pure-Python twin of classify_events' documented semantics:
    delete statuses short-circuit; terminal statuses are suppressed only
    on keys that also carry an active-status row IN THE FEED; NULL
    statuses and NULL-keyed rows are never suppressed (dirty-data
    tolerance); op is D / U-if-present / I (U when no key set given)."""
    active_keys = {
        (r["repo"], r["path"])
        for r in rows
        if r["status"] in actives and r["repo"] is not None and r["path"] is not None
    }
    out = []
    for r in rows:
        s = r["status"]
        key = (r["repo"], r["path"])
        suppressed = (
            s in terminals
            and s not in dels
            and None not in key
            and key in active_keys
        )
        if suppressed:
            continue
        if s in dels:
            op = "D"
        elif existing is None:
            op = "U"
        else:
            op = "U" if (None not in key and key in existing) else "I"
        out.append((r["repo"], r["path"], s, op))
    return sorted(out, key=lambda t: tuple((x is None, x) for x in t))


_REPOS = st.sampled_from([None, "r1", "r2"])
_PATHS = st.sampled_from([None, "p1", "p2", "p3"])
_STATUSES = st.sampled_from([None, "S", "0", "1", "3", "7", "8", "9", "X", ""])


@st.composite
def _classify_case(draw):
    rows = draw(
        st.lists(
            st.fixed_dictionaries(
                {"repo": _REPOS, "path": _PATHS, "status": _STATUSES}
            ),
            max_size=12,
        )
    )
    has_existing = draw(st.booleans())
    existing = (
        draw(st.sets(st.tuples(st.sampled_from(["r1", "r2"]),
                               st.sampled_from(["p1", "p2", "p3"]))))
        if has_existing
        else None
    )
    return rows, existing


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_classify_case())
def test_classify_events_matches_pure_model(spark, case):
    """classify_events == the pure state-machine model on random feeds
    mixing NULL keys, NULL/empty/unknown statuses, and every precedence
    interaction (delete beats terminal, terminal suppressed only beside
    an in-feed active row, presence routing I vs U)."""
    from etl_spark.cdc.classify import (
        ACTIVE_STATUSES,
        DELETE_STATUSES,
        TERMINAL_STATUSES,
        classify_events,
    )

    rows, existing = case
    df = spark.createDataFrame(
        [(r["repo"], r["path"], r["status"]) for r in rows],
        "repo string, path string, status string",
    )
    ek = (
        spark.createDataFrame(list(existing), "repo string, path string")
        if existing is not None
        else None
    )
    got = sorted(
        ((r["repo"], r["path"], r["status"], r["op"])
         for r in classify_events(df, existing_keys=ek).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    want = _classify_model(
        rows,
        existing if existing is None else {k for k in existing},
        DELETE_STATUSES, ACTIVE_STATUSES, TERMINAL_STATUSES,
    )
    assert got == want


def test_fit_trend_sums_are_exact_beyond_int64():
    """The OLS sums must not wrap: day*cents products near 2^63 overflow
    numpy int64 silently while the DuckDB oracle promotes to HUGEINT.
    Exact Python-int sums keep the two engines bit-identical."""
    big = 2**62
    pdf = pd.DataFrame(
        {"event_type": ["e", "e"], "day": [1, 2], "cents": [big, big]}
    )
    out = _fit_trend(pdf)
    # exact closed form: n=2, sx=3, sxx=5, denom=1; slope = (2*(big+2*big)
    # - 3*2*big) / 100 = 0; intercept = (2*big*5 - 3*3*big) / 100 = big/100
    assert out["slope"].iloc[0] == 0.0
    assert out["intercept"].iloc[0] == _round6(big / 100.0)
    # the wrapped-int64 formulation would have produced a NEGATIVE sxy
    # (2^62 + 2^63 wraps) and a garbage slope — pin the sign
    assert out["intercept"].iloc[0] > 0
