"""Join operators (SURVEY.md §2.3 J1-J6).

Scale notes (100 TB):
- ``enrich_join`` / ``broadcast_star_join`` broadcast the small side
  explicitly — dim tables are KBs-to-MBs while the fact side is TBs, so a
  shuffle join would move the fact table for nothing. The explicit
  ``F.broadcast`` hint survives even when size estimates are missing
  (e.g. fresh tables with no stats), matching the reference's
  ``fact_flights.py:36-61``.
- ``outer_merge_coalesce`` is a genuine shuffle (both sides keyed-exchange
  on the merge keys); at scale pre-aggregate each side first (as the
  reference does at daily grain) so the shuffled relations are already
  reduced to group cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_join(
    df: DataFrame,
    lookup: DataFrame,
    on: Column,
    how: str = "left",
    broadcast: bool = True,
    drop: Sequence[str] = (),
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """J1/J6: left equi-join against a lookup with expression keys
    (reference download_and_ingest.py:134-155 joins flight codes to
    airport/carrier lookups with trim+cast normalization inside the
    condition), then post-join column surgery (J5 aliasing is the caller's
    job via ``lookup.alias(...)``)."""
    right = F.broadcast(lookup) if broadcast else lookup
    out = df.join(right, on, how)
    for c in drop:
        out = out.drop(c)
    for old, new in (rename or {}).items():
        out = out.withColumnRenamed(old, new)
    return out


def broadcast_star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column | Sequence[str]]],
    how: str = "left",
) -> DataFrame:
    """J2: consecutive broadcast joins of a fact against its dimensions
    (reference fact_flights.py:36-61 chains 5 broadcast left joins).
    Each dim is (df, join-condition); aliasing for self-joined dims (J5)
    is done by the caller with ``dim.alias("od")``."""
    out = fact
    for dim, cond in dims:
        out = out.join(F.broadcast(dim), cond, how)
    return out


def outer_merge_coalesce(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """J4: full outer join of two keyed aggregates, then COALESCE the key
    pairs into canonical columns (reference daily_airport_performance.py:44-59
    merges departure-side and arrival-side daily aggregates per airport).

    ``keys`` = (left_col, right_col, out_col) triples. All non-key columns
    from both sides are kept.
    """
    cond = None
    for lc, rc, _ in keys:
        c = left[lc].eqNullSafe(right[rc])
        cond = c if cond is None else (cond & c)
    joined = left.join(right, cond, "outer")
    key_cols = [
        F.coalesce(left[lc], right[rc]).alias(out) for lc, rc, out in keys
    ]
    left_keys = {lc for lc, _, _ in keys}
    right_keys = {rc for _, rc, _ in keys}
    rest = [left[c] for c in left.columns if c not in left_keys] + [
        right[c] for c in right.columns if c not in right_keys
    ]
    return joined.select(*key_cols, *rest)


def semi_join(df: DataFrame, keys: DataFrame, on: Column | Sequence[str]) -> DataFrame:
    """Left-semi join: keep rows of ``df`` that have a match in ``keys``,
    never duplicating on multi-matches (≡ WHERE EXISTS). The probe side
    carries only its join columns, so at 100 TB this is the cheap way to
    apply a membership filter — broadcast when small, shuffled-hash
    otherwise; AQE picks per-partition."""
    return df.join(keys, on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: Column | Sequence[str]) -> DataFrame:
    """J7: left-anti join (≡ WHERE NOT EXISTS) — the dual of semi_join
    (used for orphan detection, e.g. customers without orders)."""
    return df.join(keys, on, "left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: spread each hot key of ``skewed`` across
    ``n_salts`` shuffle partitions by widening the join key with a salt,
    replicating ``other`` once per salt value.

    Use when one key dominates (e.g. a null-bucket or a mega-customer) and
    the replicated side is small-ish but over the broadcast threshold —
    below it, broadcast; for moderate skew, AQE skew-join (on in our
    session) already splits oversized partitions and needs no salting.
    Results are identical to a plain equi-join; the salt only re-shards.
    Join types that preserve unmatched OTHER rows (right/full outer) are
    rejected: ``other`` is replicated once per salt, so its unmatched
    rows would surface n_salts times — use the un-salted join (or salt
    the other side) for those (self-review r13).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti",
                   "cross"):
        raise ValueError(
            f"salted_join cannot preserve unmatched right-side rows under "
            f"how={how!r}: the replicated side would duplicate them per salt"
        )
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    s = skewed.withColumn("__salt_l", salt)
    o = other.withColumn(
        "__salt_r", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(
        o,
        (s[key] == o[other_key]) & (s["__salt_l"] == o["__salt_r"]),
        how,
    )
    return out.drop("__salt_l", "__salt_r")


def advised_join(
    left: DataFrame,
    right: DataFrame,
    left_on: Sequence[str],
    right_on: Sequence[str],
    advice,
    how: str = "inner",
) -> DataFrame:
    """Equi-join whose PHYSICAL strategy is driven by an advisor row
    (q_join_cardinality_advisor's planning table) — the seam that turns
    the advisor from a report into an optimizer hook, the way a 100 TB
    deployment would wire its ANALYZE stats into plan choice (reference
    analogue: the hand-tuned broadcast threshold at fact_flights.py:36-61,
    here decided by measured cardinalities instead of a constant).

    ``advice`` is any mapping with ``strategy`` ('broadcast'|'shuffle')
    and ``recommended_partitions`` (int) — e.g. a collected advisor Row.
    Semantics are those of a plain equi-join regardless of strategy (the
    advice controls ONLY the physical plan); oracle-checked end-to-end by
    j19_advised_join.

    - 'broadcast': broadcast-hash join of ``right`` (explicit hint, so it
      survives missing/over-threshold size stats).
    - 'shuffle': a ``merge`` hint forces the shuffled sort-merge join —
      broadcast is OFF the table even when Catalyst's byte-size estimate
      would auto-broadcast a row-heavy side (the advisor's ROW-based
      threshold is the authority here).

    The partition-COUNT half of the advice is applied via
    ``advised_shuffle_partitions`` (below), not here: Spark has no
    per-join shuffle-partitioning knob. Hash-repartitioning the inputs to
    N first does NOT work — when a shuffled join consumes a
    REPARTITION_BY_NUM exchange, EnsureRequirements re-plans it at
    ``spark.sql.shuffle.partitions``, silently discarding the explicit N
    (verified empirically on Spark 4.1 with and without AQE/hints; the
    logical plan keeps ``RepartitionByExpression [key], N`` but the
    physical exchanges come out at the conf value). So the count is
    driven the way Spark actually exposes it: the session conf / AQE
    advisory size, scoped by the caller around the action.
    """
    strategy = advice["strategy"]
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown advised strategy: {strategy!r}")
    cond = None
    for lk, rk in zip(left_on, right_on):
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    hinted = F.broadcast(right) if strategy == "broadcast" else right.hint("merge")
    return left.join(hinted, cond, how)


class advised_shuffle_partitions:
    """Context manager applying the COUNT half of a join-advisor row:
    sets ``spark.sql.shuffle.partitions`` to the advice's
    ``recommended_partitions`` for the duration of the block (plan +
    action belong inside), then restores the previous value.

    This is the knob Spark actually honors for shuffled-join parallelism
    (see advised_join's docstring for why per-input repartitioning is
    re-planned away); at 100 TB the same advice row would instead feed
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` per job. Scoped
    set/restore keeps the advice from leaking into unrelated queries on
    the shared session.
    """

    def __init__(self, spark, advice):
        self.spark = spark
        self.n = int(advice["recommended_partitions"])

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def skew_advised_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str,
    advice,
    how: str = "inner",
) -> DataFrame:
    """Equi-join whose skew mitigation is driven by an advisor row
    (q_join_skew_advisor's planning table — the skew axis of the
    advised_join seam): ``advice['mitigation']`` is 'salt' (a mega-key
    detected: spread it across ``advice['salts']`` shuffle partitions
    via salted_join — AQE's mapper-block skew split cannot subdivide
    one key's build rows) or 'none' (uniform keys: plain join, AQE's
    runtime handling is sufficient). Semantics are those of a plain
    equi-join either way; oracle-checked end-to-end by
    j20_skew_advised_join and pinned on a planted mega-key in
    tests/test_plans.py."""
    mitigation = advice["mitigation"]
    if mitigation == "salt":
        return salted_join(
            skewed, other, key, other_key, n_salts=int(advice["salts"]), how=how
        )
    if mitigation != "none":
        raise ValueError(f"unknown skew mitigation: {mitigation!r}")
    return skewed.join(other, skewed[key] == other[other_key], how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the columns of the
    single right row with the greatest ``right_ts`` <= ``left_ts`` within
    the same key group (≡ DuckDB/QuestDB ASOF JOIN, pandas merge_asof).

    The reference engine has no as-of operator; this is a Spark-first
    implementation of the classic union-tag algorithm: tag both sides,
    union them aligned on (keys, ts), and run a single
    ``last(..., ignoreNulls=True)`` window scan ordered by
    (ts, side) so right rows at an equal timestamp are visible to left
    rows (>= semantics). Cost: ONE shuffle on ``keys`` and a sequential
    per-key scan — no range-condition join, no per-row probe, no
    broadcast requirement, so it scales to 100 TB event streams as long
    as single keys fit a task (hot-key history is inherently sequential;
    pre-aggregate right to unique (key, ts) — required anyway for
    deterministic ties — to shrink it).

    Right payload columns are packed into a struct before the window so a
    NULL in a payload column cannot make ``last(ignoreNulls)`` skip past a
    genuinely matching row. Callers must ensure (keys, right_ts) is unique
    on the right side; tie rows would make "the" as-of match undefined.
    ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 1 HOUR")``)
    turns matches older than ``left_ts - tolerance`` into NULLs.
    """
    from pyspark.sql import Window as W

    key_list = list(keys)
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *key_list,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*key_list)
        .orderBy("__asof_ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = F.last("__payload", True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched["__ts"] >= F.col(left_ts) - tolerance, matched
        )
    out = unioned.withColumn("__m", matched).where(F.col("__side") == 1)
    proj = [c for c in left.columns] + [
        F.col("__m")[c].alias(c) for c in ["__ts", *right_cols]
    ]
    return out.select(*proj).withColumnRenamed("__ts", f"{right_ts}_matched")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join: pair every point row with every
    interval row satisfying ``lo <= point < hi`` — without the cross-join
    Catalyst would otherwise plan for a pure inequality condition.

    Spark-first strategy (the bin/bucket trick used by Databricks' range
    join optimization, not available in OSS Spark): explode each interval
    into the fixed-width buckets it covers, bucket each point, equi-join
    on the bucket id, then apply the exact predicate. A (point, interval)
    pair can only meet in the point's own bucket, so no dedup is needed.
    The inequality becomes a hash-partitionable equi-join: shuffle cost
    O(points + intervals x avg_span/bucket_width) instead of a
    nested-loop over the full cross product. Pick ``bucket_width`` near
    the median interval span: too small replicates intervals, too large
    degrades the join into few giant buckets.
    """
    n_buckets = (F.floor(F.col(hi_col) / bucket_width) -
                 F.floor(F.col(lo_col) / bucket_width))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                (F.floor(F.col(lo_col) / bucket_width) + n_buckets).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    cond = (
        (pt["__bucket"] == iv["__bucket"])
        & (pt[point_col] >= iv[lo_col])
        & (pt[point_col] < iv[hi_col])
    )
    return pt.join(iv, cond, how).drop("__bucket")
