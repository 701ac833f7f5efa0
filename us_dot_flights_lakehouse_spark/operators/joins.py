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
    """
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
