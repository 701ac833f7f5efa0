"""Aggregation operators (SURVEY.md §2.4 A1-A8).

Scale notes (100 TB):
- Every grouped aggregate here compiles to partial (map-side) + final
  HashAggregate — the shuffle carries *group* cardinality, not row
  cardinality. That is the single most important property for 100 TB aggs;
  never break it by pre-sorting or collecting.
- ``topk`` uses ``orderBy().limit(k)`` which Spark executes as
  TakeOrderedAndProject: each partition keeps only k rows, the driver
  merges k*partitions — no global sort.
- Exact-decimal sums: floating-point summation order is nondeterministic
  under parallel partial aggregation; money-like measures are cast to
  DECIMAL before SUM so results are exact and reproducible run-to-run
  (then surfaced as DOUBLE for downstream arithmetic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Decimal type wide enough for sums over ~10^12 rows of 2-dp measures.
MONEY = "decimal(28,2)"


def dec_sum(col: str | Column, alias: str) -> Column:
    """Exact, order-insensitive SUM of a money-like measure (see module note)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def conditional_count(cond: Column, alias: str) -> Column:
    """A2: pivot-style conditional count — ``sum(when(cond,1).otherwise(0))``
    (reference daily_airline_performance.py:30-34)."""
    return F.sum(F.when(cond, 1).otherwise(0)).alias(alias)


def conditional_avg(cond: Column, value: Column, alias: str) -> Column:
    """A2: conditional average — ``avg(when(cond, value))`` ignores
    non-matching rows entirely (reference daily_airline_performance.py:35-36;
    SQL equivalent: ``AVG(value) FILTER (WHERE cond)``).

    Computed as exact-decimal sum / count: the sum is order-insensitive and
    the single double division is IEEE-deterministic, so results reproduce
    bit-for-bit across runs and engines (no round() — see queries/__init__).
    """
    s = F.sum(F.when(cond, value).cast(MONEY)).cast("double")
    n = F.sum(F.when(cond, 1).otherwise(0))
    # explicit zero-denominator guard: NULL when no row matches, even
    # under ANSI mode
    return F.when(n != 0, s / n).alias(alias)


def grouped_agg(
    df: DataFrame, keys: Sequence[str | Column], aggs: Sequence[Column]
) -> DataFrame:
    """A1: grouped multi-aggregate (reference daily_airline_performance.py:20-45
    — 7 grouping keys, 13 aggregates in one pass)."""
    return df.groupBy(*keys).agg(*aggs)


def ratio(num: Column, den: Column, alias: str, scale: int = 2, pct: bool = True) -> Column:
    """A6: post-aggregation KPI ratio with divide-by-zero -> NULL semantics
    (reference daily_airline_performance.py:47-72 emits null when the
    denominator is 0 because x/0 is null in Spark SQL — preserved here)."""
    expr = num / den * (100 if pct else 1)
    return F.round(expr, scale).alias(alias)


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """A5/O1/O2: grouped-count top-k pattern's tail — global order + limit
    (reference notebook cells 11-13: groupBy().count().orderBy(desc).show(10)).
    Runs as TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*order).limit(k)


def rollup_agg(
    df: DataFrame, keys: Sequence[str | Column], aggs: Sequence[Column]
) -> DataFrame:
    """Hierarchical subtotals: GROUP BY ROLLUP(keys) — per-group rows plus
    one subtotal level per key prefix plus a grand total. Not exercised by
    the reference (SURVEY.md §2.4 'not present'); exposed because marts
    like daily_airline_performance are naturally served by one rollup pass
    instead of N separate groupBys at 100 TB (one shuffle, partial aggs
    shared across levels)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(
    df: DataFrame, keys: Sequence[str | Column], aggs: Sequence[Column]
) -> DataFrame:
    """All-subsets subtotals: GROUP BY CUBE(keys). Same single-shuffle
    property as rollup_agg; grouping_id() disambiguates levels."""
    return df.cube(*keys).agg(*aggs)
