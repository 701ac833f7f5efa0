"""Physical/utility operators (SURVEY.md §2.9 X1-X4).

X2 (keyed pre-write repartition) and X3 (coalesce single-file export) live
in sources/writers.py next to the sinks they serve.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def cached(df: DataFrame, materialize: bool = True):
    """X1: scoped cache — the reference caches shared inputs and manually
    unpersists after the consumers run (build_fact_flights.py:95-99);
    a context manager makes the release un-forgettable:

        with cached(silver) as s:
            dims = [build_dim_airline(s), build_dim_airport(s)]
    """
    df.cache()
    if materialize:
        df.count()
    try:
        yield df
    finally:
        df.unpersist()


def partition_histogram(df: DataFrame) -> list[int]:
    """X4: rows-per-partition diagnostic (reference notebook cell 6 uses
    rdd.glom().map(len) to eyeball balance). Implemented with
    spark_partition_id + groupBy — stays a DataFrame job (no Python
    per-row serialization like glom) so it is usable on big inputs.
    Returns counts indexed by partition id (empty partitions report 0)."""
    n_parts = df.rdd.getNumPartitions()
    counts = {
        r["pid"]: r["count"]
        for r in df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    }
    return [counts.get(i, 0) for i in range(n_parts)]
