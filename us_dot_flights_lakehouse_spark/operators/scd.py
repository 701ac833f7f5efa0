"""Type-2 slowly-changing-dimension (SCD2) operators — the lakehouse
dimension-history pattern the reference's star schema stops short of (its
dim tables are overwrite-rebuilt snapshots; cf.
reference spark_jobs/silver_to_gold/build_star_schema.py dim builds).

Two halves:
- ``scd2_from_changelog``: rebuild the full version history from an event
  log (gaps-and-islands: collapse consecutive identical states, then
  effective_from/effective_to/is_current/version via per-key windows).
- ``scd2_apply_updates``: the incremental MERGE shape — close current
  versions that a new batch changes, insert the new versions, leave
  unchanged keys untouched.

Scale: everything partitions by the dimension key — one hash shuffle, no
global sort; windows run per-key inside each partition. The update path
touches only (current rows ∪ update batch), never the closed history,
which is what keeps nightly dim maintenance O(batch) instead of
O(history) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    log: DataFrame,
    key_cols: list[str],
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an append-only change log into SCD2 history rows:
    (keys, state, effective_from, effective_to, is_current, version).
    Consecutive identical states merge into one version; ``effective_to``
    is the next version's start (NULL while current). ``tiebreak_col``
    must make (keys, ts, tiebreak) a total order so the history is
    deterministic under equal timestamps."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    # null-safe change detection: `state` may legitimately be NULL, so the
    # first-row marker is lag(ts) (never NULL in a log row), not lag(state),
    # and the comparison is eqNullSafe — NULL→'x' and 'x'→NULL are real
    # transitions, NULL→NULL is not (ADVICE r4)
    changes = (
        log.withColumn("_prev", F.lag(state_col).over(w))
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
        .filter(
            F.col("_prev_ts").isNull()
            | ~F.col(state_col).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_prev_ts")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(w2)
    return changes.select(
        *key_cols,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


def scd2_apply_updates(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    state_col: str = "state",
    ts_col: str = "ts",
) -> DataFrame:
    """One incremental SCD2 maintenance round: ``dim`` is existing history
    (schema of ``scd2_from_changelog``), ``updates`` is a batch of
    (keys, state, ts) observations with AT MOST ONE row per key (pre-reduce
    a multi-observation batch with ``scd2_from_changelog`` first).

    Semantics per key:
    - new key → open a version-1 row;
    - state unchanged vs the current row → no-op;
    - state changed → close the current row (effective_to = update ts) and
      open the next version.

    Closed history rows pass through untouched — the expensive side of the
    union is read-only, and the join side is (current rows ⋈ batch), both
    key-partitioned."""
    upd = updates.select(
        *key_cols, F.col(state_col).alias("_new_state"), F.col(ts_col).alias("_new_ts")
    )
    current = dim.filter(F.col("is_current"))
    closed = dim.filter(~F.col("is_current"))

    joined = current.join(upd, key_cols, "full")
    # null-safe branch classification (ADVICE r4): `state`/`_new_state` may
    # legitimately be NULL, so row-presence is detected from never-null
    # marker columns (version for the dim side, _new_ts for the batch side)
    # and states compare with eqNullSafe. Every full-join row then lands in
    # exactly one of untouched / (closed_now + opened) / opened-new-key —
    # previously a NULL-state current row receiving a change was silently
    # dropped instead of closed.
    cur_exists = F.col("version").isNotNull()
    has_upd = F.col("_new_ts").isNotNull()
    same_state = F.col("state").eqNullSafe(F.col("_new_state"))
    untouched_current = joined.filter(cur_exists & (~has_upd | same_state)).select(
        *dim.columns
    )
    closed_now = joined.filter(cur_exists & has_upd & ~same_state).select(
        *key_cols,
        "state",
        "effective_from",
        F.col("_new_ts").alias("effective_to"),
        F.lit(False).alias("is_current"),
        "version",
    )
    opened = joined.filter(has_upd & (~cur_exists | ~same_state)).select(
        *key_cols,
        F.col("_new_state").alias("state"),
        F.col("_new_ts").alias("effective_from"),
        F.lit(None).cast(dim.schema["effective_to"].dataType).alias("effective_to"),
        F.lit(True).alias("is_current"),
        (F.coalesce(F.col("version"), F.lit(0)) + 1).cast("int").alias("version"),
    )
    return closed.unionByName(untouched_current).unionByName(closed_now).unionByName(
        opened
    )
