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

from pyspark.sql import SparkSession

from etl_spark.table.manifest import (
    _ENGINE_MANAGED_COLS as _ENGINE_MANAGED,
    ManifestTable,
    check_column_name,
    validate_column_type,
)

#: the full DDL family; ``apply_evolution_op`` and the up-front ops
#: contract check (``check_schema_ops``) share this single source
KNOWN_KINDS = ("add_column", "rename_column", "widen_type", "drop_column")

#: detail keys an op kind REQUIRES (a missing one would KeyError deep in
#: the table layer, after earlier ops already committed)
_REQUIRED_DETAIL = {"rename_column": "new_name", "widen_type": "new_type"}


def check_schema_ops(
    rows, key_columns: list[str] | None = None,
    fence: int = -1, applied_offsets=(),
) -> None:
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

    With ``key_columns`` (the CDC engine passes its own), the statically
    knowable column guards are ALSO checked up front — rename/widen/drop
    of a key column, rename/drop of the CDC contract columns
    (``content``/``commit``) or the engine-managed row-metadata columns —
    so a replay never half-applies a feed whose later op is doomed.
    Schema-state-dependent guards (rename collision, no-such-column)
    necessarily stay apply-time.

    The column guards apply only to PENDING ops (offset above ``fence``
    and not in ``applied_offsets``), mirroring the apply path, which
    drops fenced ops unexecuted: a guarded op in an already-fenced WAL
    region will never run, so refusing the whole feed over it would be
    a false refusal of every legitimate pending op behind it. The
    structural checks (NULL fields, unknown kinds, duplicate offsets,
    unparseable/missing detail) stay feed-wide — malformed is malformed
    wherever it sits.
    """
    applied = set(applied_offsets)
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
        if key_columns is not None and off > fence and off not in applied:
            guard = _column_guard(kind, col, key_columns)
            if guard:
                raise ValueError(f"schema-op at offset {off}: {guard}")


# NOTE: the engine-managed column list is imported from the table layer
# above — it IS the source of truth; a local copy was a drift hazard.


def simulate_schema_ops(
    current_columns,
    rows,
    fence: int = -1,
    applied_offsets=(),
    spark: SparkSession | None = None,
) -> dict[str, str]:
    """Dry-run every PENDING op of an (already contract-checked) feed
    against the current schema, raising the refusal apply time would —
    BEFORE any op commits a schema version.

    ``check_schema_ops`` covers the statically knowable guards; the
    state-dependent ones (no-such-column, name collision, non-widenable
    type) used to surface only at apply time, AFTER earlier ops had
    already committed — a half-applied feed. But at replay start the
    schema state at every op is fully determined: data batches never
    change the schema, so it is the current schema plus the feed's own
    prior ops, in offset order. Simulating name->type through the
    pending ops makes every state-dependent refusal up-front too.

    ``current_columns``: (name, type) pairs of the CURRENT stored schema
    (engine-managed columns included — they live in the schema).
    Ops at/below ``fence`` or in ``applied_offsets`` are skipped, exactly
    as the apply path skips them, so re-validating a feed that is
    already partially applied cannot raise a false "already exists".
    Returns the simulated final name->type map (for tests/tooling).
    """
    # single source for the widening lattice — drift between the
    # simulation and the table layer would make this check lie
    from etl_spark.table.manifest import _WIDEN_OK

    applied = set(applied_offsets)
    names: dict[str, str] = {str(n): str(t) for n, t in current_columns}
    pending = sorted(
        (r for r in rows if r["offset"] > fence and r["offset"] not in applied),
        key=lambda r: r["offset"],
    )
    for r in pending:
        off, kind, col = r["offset"], r["kind"], r["column"]
        d = json.loads(r["detail"]) if r["detail"] else {}

        def fail(msg: str, off=off) -> None:
            raise ValueError(
                f"schema-op at offset {off} is doomed: {msg} (refused up "
                "front — no batch or earlier op has applied)"
            )

        if kind == "add_column":
            try:
                check_column_name(col)
            except ValueError as e:
                fail(str(e))
            # collision modulo case, mirroring the table layer: Spark
            # resolves references case-insensitively by default
            if any(n.lower() == col.lower() for n in names):
                fail(f"column {col!r} already exists")
            # an unparseable type or uncastable default commits fine and
            # then wedges every later read/merge — run the table layer's
            # pre-commit validation here so the whole feed is refused
            # before ANY op applies (apply time re-checks regardless)
            # engine callers pass their session explicitly — relying on
            # the thread-local active session alone silently skipped the
            # type/default validation from non-driver threads (streaming
            # foreachBatch), degrading "whole feed refused up front" back
            # to half-applied
            sess = spark or SparkSession.getActiveSession()
            if sess is not None:
                try:
                    validate_column_type(
                        sess, str(d.get("type", "string")), d.get("default")
                    )
                except ValueError as e:
                    fail(str(e))
            names[col] = str(d.get("type", "string"))
        elif kind == "rename_column":
            new = d["new_name"]
            try:
                check_column_name(new)
            except ValueError as e:
                fail(str(e))
            if col not in names:
                fail(f"no column {col!r}")
            # case-insensitive collision, the renamed column itself
            # exempt so a pure case change stays legal (table-layer
            # semantics)
            if any(n.lower() == new.lower() and n != col for n in names):
                fail(f"cannot rename {col!r} to {new!r}: column {new!r} already exists")
            names[new] = names.pop(col)
        elif kind == "widen_type":
            new_t = str(d["new_type"])
            if col not in names:
                fail(f"no column {col!r}")
            cur_t = names[col]
            if cur_t != new_t and (cur_t, new_t) not in _WIDEN_OK:
                fail(f"cannot widen {cur_t} -> {new_t}")
            names[col] = new_t
        elif kind == "drop_column":
            if col not in names:
                fail(f"no column {col!r}")
            del names[col]
    return names


def _column_guard(kind: str, column: str, key_columns: list[str]) -> str | None:
    """The statically knowable reasons a DDL op must refuse at the CDC
    layer, shared by the up-front feed check and apply time."""
    if kind == "add_column":
        # WAL-internal routing columns: the merge's winner frame carries
        # them alongside the payload, so a stored column of the same
        # name would silently capture the EVENT's op code / offset /
        # batch id for every post-DDL winner instead of the declared
        # default (probed: add_column 'op' default 'Z' stored 'U'/'I').
        # Compared case-insensitively: Spark's default resolution would
        # bind a stored 'Op' to the event frame's 'op' just the same.
        if column.lower() in ("op", "offset", "batch_id"):
            return (
                f"cannot add column {column!r}: the name is reserved by "
                "the WAL contract (the merge would silently store the "
                "event's routing value in it instead of the default)"
            )
        return None
    if column in key_columns:
        return (
            f"cannot {kind.split('_')[0]} key column {column!r}: the "
            "bucket layout and LWW key identity depend on it "
            "(rebucket/recreate instead)"
        )
    if kind in ("rename_column", "drop_column"):
        if column in ("content", "commit"):
            return (
                f"cannot {kind.split('_')[0]} {column!r}: the CDC merge "
                "references it by name every batch (content -> "
                "content_sha256 fingerprint; commit -> LWW order and "
                "tombstone watermark)"
            )
        if column in _ENGINE_MANAGED:
            return (
                f"cannot {kind.split('_')[0]} engine-managed column "
                f"{column!r}: the write path recomputes it every batch"
            )
    return None


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
    # key/engine-managed columns are refused by the table layer too; the
    # CDC layer additionally pins its WAL-contract columns (`content`:
    # the per-row sha256 fingerprint derives from it; `commit`: the LWW
    # total order and tombstone watermark compare it by name). Enforced
    # here for direct calls AND up front by check_schema_ops so a replay
    # never half-applies a feed whose later op is doomed.
    guard = _column_guard(kind, column, table.key_columns)
    if guard:
        raise ValueError(guard)
    if kind == "add_column":
        table.add_column(column, d.get("type", "string"), d.get("default"), properties_update)
    elif kind == "rename_column":
        table.rename_column(column, d["new_name"], properties_update)
    elif kind == "widen_type":
        table.widen_type(column, d["new_type"], properties_update)
    elif kind == "drop_column":
        table.drop_column(column, properties_update)
    else:
        raise ValueError(f"unknown schema-evolution kind: {kind!r}")
