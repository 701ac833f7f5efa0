"""Silver enrichment stage (reference ``flight_data_enricher.py``):
delay categorization, performance metrics, operational metrics."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delay_category(delay: Column) -> Column:
    """Multi-branch categorization (reference flight_data_enricher.py:9-41)."""
    return (
        F.when(delay.isNull(), "UNKNOWN")
        .when(delay <= 0, "ON_TIME_OR_EARLY")
        .when(delay <= 15, "MINOR_DELAY")
        .when(delay <= 60, "MODERATE_DELAY")
        .otherwise("SEVERE_DELAY")
    )


def categorize_delays(df: DataFrame) -> DataFrame:
    # one withColumns batch: independent targets from untouched inputs
    # (chained withColumn re-analyzes the wide plan per call — r13)
    return df.withColumns(
        {
            "DEP_DELAY_CATEGORY": _delay_category(F.col("DEP_DELAY")),
            "ARR_DELAY_CATEGORY": _delay_category(F.col("ARR_DELAY")),
        }
    )


def calculate_performance_metrics(df: DataFrame) -> DataFrame:
    """Average speed mph = distance / air_time * 60, null-guarded
    (reference flight_data_enricher.py:43-52)."""
    return df.withColumn(
        "AVG_SPEED_MPH",
        F.when(
            F.col("AIR_TIME").isNotNull() & (F.col("AIR_TIME") > 0),
            F.col("DISTANCE") / F.col("AIR_TIME") * 60,
        ),
    )


def add_operational_metrics(df: DataFrame) -> DataFrame:
    """Route code/name + weekend flag
    (reference flight_data_enricher.py:54-68)."""
    return df.withColumns(
        {
            "ROUTE_CODE": F.concat_ws("-", "ORIGIN", "DEST"),
            "IS_WEEKEND": F.dayofweek("FLIGHT_DATE").isin(1, 7),
            "IS_ON_TIME": F.when(
                F.col("ARR_DELAY").isNotNull(), F.col("ARR_DELAY") <= 15
            ),
        }
    )


def enrich_flights(df: DataFrame) -> DataFrame:
    """Full enrichment chain (reference flights_silver_transform.py:49-62)."""
    return add_operational_metrics(
        calculate_performance_metrics(categorize_delays(df))
    )
