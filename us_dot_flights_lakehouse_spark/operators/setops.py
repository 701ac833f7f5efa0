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
