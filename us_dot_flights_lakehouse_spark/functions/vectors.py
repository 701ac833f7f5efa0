"""Vector primitives over ``array<float>`` embedding columns — pure Column
expressions (zip_with + a sequential left fold), fully JVM-side.

Determinism: the fold accumulates left-to-right in double precision, which
is the same evaluation order DuckDB's list_sum uses — cosine values are
bit-comparable across engines (still, queries avoid *outputting* raw
floats where a threshold/rank fully captures the semantics).

Scale note (100 TB): expression-level dot products are fine for the
brute-force baseline (scan-local, no shuffle, whole-stage codegen). For
billion-vector corpora switch to the LSH-bucketed path in
``llm/similarity.py`` which prunes candidates before any distance math.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@lru_cache(maxsize=512)
def _parse_expr_cached(sql: str) -> Column:
    """Parse-once cache for literal expressions: Column objects wrap an
    immutable JVM expression tied to the process-wide gateway (not a
    session), so reusing one across queries/sessions is safe and skips
    the repeated parse of multi-KB literal tables (r13, guide §7.3).
    Holds expressions only — never data, plans, or results."""
    return F.expr(sql)


def lit_doubles(vals) -> Column:
    """Literal array<double> built as ONE parsed SQL expression.
    ``F.array(*[F.lit(x) ...])`` issues a Py4J round-trip per element —
    measured ~9 s of pure driver time for 16K elements (PQ codebooks) —
    while a single array literal parses in milliseconds. ``repr(float)``
    is the shortest round-tripping decimal, so the parsed double is
    bit-identical to the python value."""
    return _parse_expr_cached(
        "array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")"
    )


def lit_double_matrix(rows) -> Column:
    """Literal array<array<double>> (e.g. a codebook) as one expression."""
    inner = [
        "array(" + ",".join(repr(float(v)) + "D" for v in row) + ")" for row in rows
    ]
    return _parse_expr_cached("array(" + ",".join(inner) + ")")


def to_double_array(col: str | Column) -> Column:
    # column-name fast path: one parsed expression instead of the ~8
    # Py4J round-trips of the lambda transform (r13 — driver-side plan
    # construction measurably dominates the sim family; guide §7.3).
    # Parsed and composed forms analyze to the identical tree.
    if isinstance(col, str):
        return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product of two double arrays (column-name
    args take the one-parsed-expression fast path)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
            " (acc, v) -> acc + v)"
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize_int8(a: Column) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization of a double array: per-vector
    scale = 127 / max|x|, codes = floor(x * scale) clamped to [-127, 127].
    Returns (scale, codes). floor (not round) keeps the mapping exact and
    bit-identical across engines; all ops are doubles + exact floor.

    Scale note: this is the storage-compression path for billion-vector
    corpora (4x smaller than float32, 8x than float64); distance math on
    codes needs only integer multiplies plus one per-vector double scale."""
    maxabs = F.array_max(F.transform(a, lambda x: F.abs(x)))
    scale = F.lit(127.0) / maxabs
    codes = F.transform(
        a,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x * scale).cast("int"))
        ),
    )
    return scale, codes


def dequantize_l2_error(a: Column, codes: Column, scale: Column) -> Column:
    """Sum of squared reconstruction error between the original doubles and
    code/scale — a sequential left fold, so cross-engine bit-comparable."""
    recon = F.transform(codes, lambda c: c.cast("double") / scale)
    return F.aggregate(
        F.zip_with(a, recon, lambda x, r: (x - r) * (x - r)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
