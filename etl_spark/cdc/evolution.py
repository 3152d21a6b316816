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
