"""File-level column statistics for manifest entries (data skipping).

Each committed data dir records, per tracked column, the min/max/null
count aggregated over its parquet files' FOOTER statistics — no data
pages are read, ever. ``ManifestTable`` stores the result inline in the
snapshot's file entry, and ``read(where=...)`` prunes whole entries
whose recorded range disproves a predicate before Spark plans the scan
(the Iceberg manifest-stats analog; Iceberg spec §Manifests
lower_bounds/upper_bounds).

Scale shape: collection runs per COMMIT over the dirs that commit just
wrote — O(touched buckets x files_per_bucket) footer reads, bounded by
batch size, never table-sized. Pruning is a pure in-memory pass over
the manifest on the driver, exactly like every table format's planning
phase. Reference analog: none (the reference re-reads whole tables,
e.g. src/utils/database.py full-table SELECTs); this is what replaces
that pattern at 100 TB.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as pq

# Stats values land in the JSON snapshot: cap string bounds so a wide
# content column can never bloat the manifest. A truncated MAX is not a
# valid upper bound, so over-long bounds are DROPPED (conservative:
# entry stays unprunable on that column), never trimmed.
MAX_STAT_LEN = 256
_SCALARS = (str, int, float, bool)


def _merge_col(acc: dict, name: str, st) -> None:
    """Fold one column chunk's footer statistics into the accumulator.
    A chunk with non-null values but unusable bounds (missing, non-scalar
    logical type, or over-long strings) marks the column ``unknown`` —
    its true range is uncovered, so pruning on it would be unsound. An
    all-null chunk contributes nothing to min/max and poisons nothing:
    predicates are null-rejecting, so other chunks' bounds stay complete."""
    c = acc.setdefault(name, {"nulls": 0})
    if st is None:
        c["unknown"] = True
        return
    if st.has_null_count:
        c["nulls"] += st.null_count
    else:
        # a footer may record bounds without a null count — 'unknown'
        # must not be conflated with 'zero' (a null-aware consumer
        # reading a definite 0 for a column that HAS nulls would be
        # unsound the day one exists; bounds stay usable either way)
        c["nulls_unknown"] = True
    if not st.has_min_max:
        if st.num_values:
            c["unknown"] = True
        return
    lo, hi = st.min, st.max
    ok = (
        isinstance(lo, _SCALARS)
        and isinstance(hi, _SCALARS)
        and not (isinstance(lo, str) and len(lo) > MAX_STAT_LEN)
        and not (isinstance(hi, str) and len(hi) > MAX_STAT_LEN)
    )
    if not ok:
        c["unknown"] = True
        return
    c["min"] = lo if "min" not in c else min(c["min"], lo)
    c["max"] = hi if "max" not in c else max(c["max"], hi)


def _file_stats(path: str, columns: set[str]) -> tuple[int, int, dict]:
    """(rows, bytes, {col: {"min","max","nulls"} | {"unknown"}}) for one
    parquet file, from footer metadata only."""
    md = pq.ParquetFile(path).metadata
    acc: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name in columns:
                _merge_col(acc, name, col.statistics)
    return md.num_rows, os.path.getsize(path), acc


def collect_dir_stats(dir_path: str, columns: list[str]) -> dict:
    """Aggregate footer stats over every parquet file in one entry dir.

    Returns ``{"rows": n, "bytes": b, "stats": {col: {"min": v,
    "max": v, "nulls": n}}}``; a column appears only when EVERY chunk
    contributed usable bounds (otherwise pruning on it would be unsound).
    """
    files = [
        os.path.join(dir_path, f)
        for f in sorted(os.listdir(dir_path))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    colset = set(columns)
    rows = size = 0
    merged: dict[str, dict] = {}
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(files)))) as ex:
        for r, b, acc in ex.map(lambda p: _file_stats(p, colset), files):
            rows += r
            size += b
            for name, c in acc.items():
                m = merged.setdefault(name, {"nulls": 0})
                m["nulls"] += c["nulls"]
                if c.get("nulls_unknown"):
                    m["nulls_unknown"] = True
                if c.get("unknown"):
                    m["unknown"] = True
                elif "min" in c:  # all-null files contribute nulls only
                    m["min"] = c["min"] if "min" not in m else min(m["min"], c["min"])
                    m["max"] = c["max"] if "max" not in m else max(m["max"], c["max"])
    stats = {
        name: {
            "min": m["min"], "max": m["max"],
            # None = at least one chunk omitted its null count (unknown,
            # not zero); bounds-based pruning never consults this field
            "nulls": None if m.get("nulls_unknown") else m["nulls"],
        }
        for name, m in merged.items()
        if not m.get("unknown") and "min" in m
    }
    return {"rows": rows, "bytes": size, "stats": stats}


def entry_excludes(col_stats: dict | None, op: str, value) -> bool:
    """True iff the recorded [min, max] range PROVES no row in the entry
    can satisfy ``col op value``. Missing stats or cross-type
    comparisons always return False (never prune on doubt). Predicates
    are null-rejecting (SQL semantics), so null counts never block
    pruning.

    Float bounds are NaN-hazardous: parquet writers EXCLUDE NaN from
    footer min/max, while Spark orders NaN above every double (and
    NaN = NaN is true) — so a file ``[1.0, NaN]`` records ``max=1.0``
    and upper-bound pruning of ``v > 5.0`` would drop the NaN row Spark
    must return (the hazard Iceberg tracks ``nan_value_counts`` for).
    For float bounds only LOWER-bound rules apply: a possibly-present
    NaN can never satisfy ``<`` / ``<=`` / ``= value-below-min``, but
    could satisfy any upper-bound-proved predicate."""
    c = col_stats
    if not c or c.get("min") is None or c.get("max") is None:
        return False
    lo, hi = c["min"], c["max"]
    hi_usable = not (isinstance(lo, float) or isinstance(hi, float))
    try:
        if op == "=":
            return value < lo or (hi_usable and value > hi)
        if op == "<":
            return lo >= value
        if op == "<=":
            return lo > value
        if op == ">":
            return hi_usable and hi <= value
        if op == ">=":
            return hi_usable and hi < value
        if op == "in":
            return all(v < lo or (hi_usable and v > hi) for v in value)
    except TypeError:
        return False
    return False
