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


def _lww_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events for one key into the kept winner."""
    if state.exists:
        cur_commit, cur_offset, cur_lang, cur_content, cur_deleted = state.get
    else:
        cur_commit, cur_offset, cur_lang, cur_content, cur_deleted = None, -1, None, None, True
    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # batch-local winner first (vectorized): max by (commit, offset)
        idx = pdf.sort_values(["commit", "offset"]).index[-1]
        row: Any = pdf.loc[idx]
        if cur_commit is None or (str(row["commit"]), int(row["offset"])) > (cur_commit, cur_offset):
            cur_commit = str(row["commit"])
            cur_offset = int(row["offset"])
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
