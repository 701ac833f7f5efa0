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

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
