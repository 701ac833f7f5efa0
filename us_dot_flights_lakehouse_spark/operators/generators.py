"""Row-generator sources (SURVEY.md §2.5 O3).

Scale note: generators run entirely JVM-side (Range + Generate nodes in
whole-stage codegen); a 100-year date dim is ~36K rows — always broadcast
it into fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_range_df(
    spark: SparkSession, start: str, end: str, col_name: str = "full_date"
) -> DataFrame:
    """O3: contiguous date spine via sequence(interval 1 day) + explode
    (reference dim_date.py:10-16)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("interval 1 day"),
            )
        ).alias(col_name)
    )


def minute_of_day_df(spark: SparkSession, col_name: str = "time_key") -> DataFrame:
    """O3: 0..1439 minute-of-day spine via spark.range
    (reference dim_time.py:10)."""
    return spark.range(0, 1440).select(F.col("id").cast("int").alias(col_name))
