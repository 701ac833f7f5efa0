"""Z-order (Morton-curve) data layout — the lakehouse multi-dimensional
clustering technique (Delta OPTIMIZE ZORDER BY, Hudi/Iceberg z-ordering).

Why it matters at 100 TB: parquet/Delta data skipping prunes files by
per-file column min/max. A single-column sort gives tight ranges on ONE
column only; interleaving the bits of several columns into one sort key
gives every participating column *moderately* tight per-file ranges, so
predicates on ANY of them skip most files. The reference stores its
tables in Delta (reference spark_jobs/bronze_ingest/
download_and_ingest.py:204-209); this module supplies the layout
optimization Delta's OPTIMIZE would, expressed as plain Spark.

Everything is JVM-side unrolled bit arithmetic (shiftright/and/shiftleft
terms composed in Python — whole-stage codegen, no interpreted lambdas,
no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_interleave(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton z-value of two non-negative ints: bit i of ``x`` lands at
    position 2i, bit i of ``y`` at 2i+1. NULL in either coordinate yields
    NULL (the null bucket stays visible to the caller). ``bits`` ≤ 31 per
    coordinate keeps the result inside a signed 64-bit long."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    x = x.cast("long")
    y = y.cast("long")
    out = None
    for i in range(bits):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = tx + ty
        out = term if out is None else out + term
    return out


def z_interleave_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The DuckDB/ANSI replica of ``z_interleave`` over arbitrary integer
    expressions — the oracle side of the contract."""
    # each term fully parenthesized: DuckDB/Postgres give << LOWER
    # precedence than +, so an unparenthesized "a << 2 + b << 3" chain
    # parses as cascading shifts
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of
    (``x_col``, ``y_col``): range-partition on the z-value (contiguous
    curve segments per file) and sort within partitions, so every file's
    min/max are tight on BOTH columns and scans filtering on either one
    skip most files. One range exchange + local sort — no global sort."""
    z = z_interleave(F.col(x_col), F.col(y_col), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
