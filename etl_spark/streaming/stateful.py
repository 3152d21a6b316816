"""Custom stateful streaming operator: incremental LWW current-state.

``applyInPandasWithState`` keeps one (commit, offset) winner per
``(repo, path)`` across micro-batches — the streaming form of the
engine's LWW kernel (SURVEY.md C4/W3): arbitrary per-key state that a
plain windowed aggregation can't express, with Arrow-batched pandas on
the executor (no per-row Python driver loops).

Each trigger emits one row per key that CHANGED in that trigger
(`update` semantics); a later event that loses to the stored state is
absorbed silently, exactly like the batch merge. Deletes emit
``deleted=true`` and clear the content from state.

Batch-parity invariant (tested): replaying a WAL directory through
this operator and taking each key's last emission equals the batch
engine's final state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "repo string, path string, commit string, offset long, "
    "lang string, content string, deleted boolean"
)
STATE_SCHEMA = "commit string, offset long, lang string, content string, deleted boolean"


def _order_key(commit: str | None, offset: int) -> tuple:
    """The batch engine's struct-ordering twin: a NULL commit sorts
    below EVERY non-NULL commit (replay.contract_null_aggs admits NULL
    commits because all three batch LWW strategies order them this
    way), and offset breaks ties among NULLs."""
    return (commit is not None, commit if commit is not None else "", offset)


def _lww_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events for one key into the kept winner."""
    if state.exists:
        cur_commit, cur_offset, cur_lang, cur_content, cur_deleted = state.get
        has_state = True
    else:
        cur_commit, cur_offset, cur_lang, cur_content, cur_deleted = None, -1, None, None, True
        # a separate flag, NOT `cur_commit is None`: a stored winner may
        # legitimately carry a NULL commit, and conflating the two would
        # let any later event replace it unconditionally
        has_state = False
    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # batch-local winner first (vectorized): max by (commit, offset)
        # with na_position='first' so a NULL commit LOSES here exactly
        # as it does in the batch strategies' struct max
        idx = pdf.sort_values(["commit", "offset"], na_position="first").index[-1]
        row: Any = pdf.loc[idx]
        # pd.isna, not str(): stringifying a NaN commit would store the
        # literal "nan" and win every future comparison as a real string
        new_commit = None if pd.isna(row["commit"]) else str(row["commit"])
        new_offset = int(row["offset"])
        if not has_state or _order_key(new_commit, new_offset) > _order_key(cur_commit, cur_offset):
            cur_commit = new_commit
            cur_offset = new_offset
            has_state = True
            if row["op"] == "D":
                cur_lang, cur_content, cur_deleted = None, None, True
            else:
                cur_lang = None if pd.isna(row["lang"]) else str(row["lang"])
                cur_content = None if pd.isna(row["content"]) else str(row["content"])
                cur_deleted = False
            changed = True
    if changed:
        state.update((cur_commit, cur_offset, cur_lang, cur_content, cur_deleted))
        yield pd.DataFrame(
            {
                "repo": [key[0]],
                "path": [key[1]],
                "commit": [cur_commit],
                "offset": [cur_offset],
                "lang": [cur_lang],
                "content": [cur_content],
                "deleted": [cur_deleted],
            }
        )


def stream_lww_state(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame in CHANGE_LOG_SCHEMA. Returns the
    update-mode stream of per-key state changes."""
    return events.groupBy("repo", "path").applyInPandasWithState(
        _lww_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
