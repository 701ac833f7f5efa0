"""Query registry — the driver-facing catalog of implemented operators.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB
over the same parquet tables. ``__spark_entry__.py`` exposes this registry.

Determinism contract (why results hash-match the oracle bit-for-bit):
- money-like SUMs go through exact DECIMAL accumulation, surfaced as DOUBLE
  (float summation order is nondeterministic under parallel aggregation);
- derived ratios/averages are computed with plain IEEE-754 double ops
  (cast → multiply → divide) with NO round() — both engines then produce
  identical bit patterns; round() is avoided because Spark rounds via
  BigDecimal (decimal-exact) while other engines round in binary floating
  point, which can disagree (classic round(2.675, 2) case);
- integer-valued aggregates are BIGINT on both sides;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from us_dot_flights_lakehouse_spark.queries import (
    flights,
    llm,
    quality,
    relational,
    streaming,
)

_MODULES = (relational, llm, streaming, quality, flights)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
