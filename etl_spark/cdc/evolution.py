"""In-flight schema evolution: apply DDL events interleaved in the log.

Evolution events share the change log's offset order; the replay engine
applies every evolution op whose offset falls inside a batch's range
*before* merging that batch's data events, so rows merged after the op
land under the new schema while older files stay untouched
(metadata-only evolution — no rewrite).

Reference analogs: imposed/renamed headers
(``src/byggesager/byggesager.py:36``, ``src/jobindsats/jobindsats.py:42-51``)
and the try-coerce type-widening loop (``src/jobs/indkoebsdata.py:137-147``)
— re-expressed as explicit, versioned DDL instead of inference.
"""

from __future__ import annotations

import json

from etl_spark.table.manifest import ManifestTable

#: the full DDL family; ``apply_evolution_op`` and the up-front ops
#: contract check (``check_schema_ops``) share this single source
KNOWN_KINDS = ("add_column", "rename_column", "widen_type", "drop_column")

#: detail keys an op kind REQUIRES (a missing one would KeyError deep in
#: the table layer, after earlier ops already committed)
_REQUIRED_DETAIL = {"rename_column": "new_name", "widen_type": "new_type"}


def check_schema_ops(rows) -> None:
    """Refuse a malformed schema-ops feed loudly, before any op commits.

    The ops frame is user-supplied (``ReplayEngine.replay(schema_ops=)``,
    CLI ``--schema-ops``) and tiny (DDL events), so it is validated
    driver-side in full. Without this check each defect is a SILENT
    wrong outcome, not an error: a PERMISSIVE-mode malformed JSON line
    yields an all-NULL row whose NULL offset every ``offset <= hi``
    batch filter drops (the op never applies, nothing reports it); two
    distinct ops at the same offset collapse to one because the
    exactly-once ledger (``applied_schema_ops``) is keyed by offset; and
    a missing detail key fails only when its batch is reached — AFTER
    earlier ops have already committed schema versions.
    """
    seen: dict = {}
    for r in rows:
        off, kind, col = r["offset"], r["kind"], r["column"]
        if off is None or kind is None or col is None:
            raise ValueError(
                f"schema-ops contract violation: NULL in a required field "
                f"(offset={off!r}, kind={kind!r}, column={col!r}) — likely "
                "a malformed line read in PERMISSIVE mode. A NULL offset "
                "cannot be ordered against batch ranges, so the op would "
                "be silently dropped. Clean or reject the ops feed."
            )
        if kind not in KNOWN_KINDS:
            raise ValueError(
                f"unknown schema-evolution kind {kind!r} at offset {off} "
                f"(known: {', '.join(KNOWN_KINDS)})"
            )
        if off in seen:
            raise ValueError(
                f"duplicate schema-op offset {off} ({seen[off]} vs "
                f"{kind} {col!r}): offsets identify ops in the "
                "exactly-once ledger, so the second op would be silently "
                "skipped. Give every DDL event a unique offset in the "
                "log's offset sequence."
            )
        seen[off] = f"{kind} {col!r}"
        detail = r["detail"]
        if detail:
            try:
                d = json.loads(detail)
            except (json.JSONDecodeError, TypeError) as e:
                raise ValueError(
                    f"schema-op at offset {off} has unparseable detail "
                    f"JSON {detail!r}: {e}"
                ) from None
        else:
            d = {}
        req = _REQUIRED_DETAIL.get(kind)
        if req and req not in d:
            raise ValueError(
                f"schema-op {kind} {col!r} at offset {off} requires "
                f"detail key {req!r} (got {sorted(d)})"
            )


def apply_evolution_op(
    table: ManifestTable,
    kind: str,
    column: str,
    detail: str | None,
    properties_update: dict | None = None,
) -> None:
    """Apply one DDL event. ``properties_update`` commits atomically with
    the schema change — the replay engine passes the updated
    ``applied_schema_ops`` here so a crash right after this commit (before
    the batch's data commit) leaves the op durably recorded and resume
    never re-applies it."""
    d = json.loads(detail) if detail else {}
    if kind == "add_column":
        table.add_column(column, d.get("type", "string"), d.get("default"), properties_update)
    elif kind == "rename_column":
        table.rename_column(column, d["new_name"], properties_update)
    elif kind == "widen_type":
        table.widen_type(column, d["new_type"], properties_update)
    elif kind == "drop_column":
        # key/engine-managed columns are refused by the table layer; the
        # CDC layer additionally pins `content`: the per-row sha256
        # fingerprint invariant (north_rule) derives from it, so a table
        # without it cannot compute content_sha256 on the next batch
        if column == "content":
            raise ValueError(
                "cannot drop 'content': the engine's content_sha256 "
                "fingerprint is computed from it on every write"
            )
        table.drop_column(column, properties_update)
    else:
        raise ValueError(f"unknown schema-evolution kind: {kind!r}")
