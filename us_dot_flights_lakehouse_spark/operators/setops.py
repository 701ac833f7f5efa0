"""Set operators (SURVEY.md §2.6 U1).

Scale note: ``union().distinct()`` shuffles on all columns; project to the
minimal column set *before* the union so the distinct's exchange carries
only the key bytes (the reference unions two 2-column projections of the
flight feed — dim_airport.py:14 — never whole rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """U1: UNION DISTINCT of column-aligned projections
    (reference dim_airport.py:7-18 unions origin- and dest- airport
    projections then distincts)."""
    it = iter(dfs)
    out = next(it)
    for df in it:
        out = out.union(df)
    return out.distinct()


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT (distinct) — rows present in both inputs. Spark plans this
    as a left-semi hash join over distinct keys; project to the minimal
    columns first for the same shuffle-width reason as union_distinct."""
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT (distinct) — distinct rows of ``a`` absent from ``b``
    (left-anti under the hood; NOT exceptAll, which is per-occurrence
    multiset difference). Complements U1/intersect for the set-op surface."""
    return a.subtract(b)
