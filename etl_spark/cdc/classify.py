"""Status-code -> change-op classifier (SURVEY.md C2).

The reference's event state machine (``src/sd_delta.py:14,106-119``)
maps an employment-status code to an action with precedence:

- code ``'S'`` (deleted) -> handle as a DELETE, short-circuiting
  everything else,
- codes ``'0'/'1'/'3'`` (employed states) mark the key *active*
  (``has_active``),
- terminal codes ``'7'/'8'/'9'`` are ignored once the key is active
  (an emigrated/resigned/retired record cannot demote an active one),
  but processed while inactive.

Re-expressed set-based: the per-key ``has_active`` flag is a window-free
max over a thin projection (same skew-safe shape as the LWW kernel),
broadcast back, and the op column is a single ``F.when`` chain — no
driver loop over employees, no per-row Python. Output rows carry
``op`` in CHANGE_LOG_SCHEMA terms (I/U/D), ready for
``ReplayEngine.replay`` (wired via its ``classify`` argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference status vocabulary (src/sd_delta.py:14)
DELETE_STATUSES = ["S"]
ACTIVE_STATUSES = ["0", "1", "3"]
TERMINAL_STATUSES = ["7", "8", "9"]


def classify_events(
    df: DataFrame,
    status_col: str = "status",
    key_columns: list[str] | None = None,
    delete_statuses: list[str] | None = None,
    active_statuses: list[str] | None = None,
    terminal_statuses: list[str] | None = None,
    existing_keys: DataFrame | None = None,
) -> DataFrame:
    """Map raw status-coded rows to I/U/D ops with the reference's
    precedence. Returns the input plus an ``op`` column, with suppressed
    rows (terminal status on an active key) dropped.

    - ``delete_statuses`` -> ``op = 'D'``
    - terminal statuses on a key that has at least one active-status row
      in the same feed -> dropped (reference: ``has_active`` guard)
    - everything else -> ``'U'`` when the key is already present in
      ``existing_keys`` (the table's live keys) else ``'I'``; without
      ``existing_keys``, upserts classify as ``'U'`` (the engine's merge
      treats I and U identically — the distinction is lineage only).
    """
    keys = list(key_columns or ["repo", "path"])
    dels = list(delete_statuses or DELETE_STATUSES)
    actives = list(active_statuses or ACTIVE_STATUSES)
    terminals = list(terminal_statuses or TERMINAL_STATUSES)
    s = F.col(status_col)

    # per-key has_active: thin max over (keys, active?) — map-side
    # combine makes hot keys cheap, broadcast keeps content unshuffled
    has_active = (
        df.select(*keys, s.isin(actives).cast("int").alias("__a"))
        .groupBy(*keys)
        .agg(F.max("__a").alias("__has_active"))
    )
    out = df.join(F.broadcast(has_active), on=keys, how="left")
    out = out.filter(
        ~(s.isin(terminals) & (F.col("__has_active") == 1) & ~s.isin(dels))
    )

    if existing_keys is not None:
        present = existing_keys.select(*keys).dropDuplicates().withColumn(
            "__present", F.lit(True)
        )
        out = out.join(F.broadcast(present), on=keys, how="left")
        upsert_op = F.when(F.col("__present").isNotNull(), "U").otherwise("I")
    else:
        upsert_op = F.lit("U")

    op = F.when(s.isin(dels), "D").otherwise(upsert_op)
    return out.withColumn("op", op).drop("__has_active", "__present", "__a")
