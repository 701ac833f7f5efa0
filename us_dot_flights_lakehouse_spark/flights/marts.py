"""Gold aggregate marts (reference ``spark_jobs/gold_marts/aggregates/``):
daily airline performance, daily airport performance (dep/arr outer
merge), route performance — each one partial+final hash aggregate whose
shuffle carries group cardinality only."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.operators.aggregates import (
    conditional_avg,
    conditional_count,
    dec_sum,
    ratio,
)
from us_dot_flights_lakehouse_spark.operators.joins import outer_merge_coalesce

# lazy: building Columns requires an active SparkContext
def _operated():
    return ~F.col("IS_CANCELLED")


def _on_time():
    return _operated() & (F.col("ARR_DELAY_MINUTES") <= 15)


def _delayed():
    return _operated() & (F.col("ARR_DELAY_MINUTES") > 15)


def daily_airline_performance(silver: DataFrame) -> DataFrame:
    """Reference daily_airline_performance.py:9-74 — wide groupBy with
    plain + conditional aggregates, then the KPI ratio block (null on
    zero denominators)."""
    agg = silver.groupBy(
        "FLIGHT_DATE",
        F.year("FLIGHT_DATE").alias("YEAR"),
        F.month("FLIGHT_DATE").alias("MONTH"),
        "AIRLINE_CODE",
    ).agg(
        F.count("*").alias("TOTAL_FLIGHTS"),
        conditional_count(F.col("IS_CANCELLED"), "CANCELLED_FLIGHTS"),
        conditional_count(F.col("IS_DIVERTED"), "DIVERTED_FLIGHTS"),
        conditional_count(_operated(), "COMPLETED_FLIGHTS"),
        conditional_count(_on_time(), "ON_TIME_FLIGHTS"),
        conditional_count(_delayed(), "DELAYED_FLIGHTS"),
        conditional_avg(_operated(), F.col("DEP_DELAY_MINUTES"), "AVG_DEP_DELAY"),
        conditional_avg(_operated(), F.col("ARR_DELAY_MINUTES"), "AVG_ARR_DELAY"),
        F.max("DEP_DELAY_MINUTES").alias("MAX_DEP_DELAY"),
        F.max("ARR_DELAY_MINUTES").alias("MAX_ARR_DELAY"),
        dec_sum("DISTANCE_MILES", "TOTAL_DISTANCE_MILES"),
        conditional_avg(_operated(), F.col("AVG_SPEED_MPH"), "AVG_SPEED_MPH"),
        F.countDistinct("ROUTE_CODE").alias("ROUTES_SERVED"),
    )
    return agg.select(
        "*",
        ratio(F.col("COMPLETED_FLIGHTS"), F.col("TOTAL_FLIGHTS"), "COMPLETION_RATE"),
        ratio(F.col("ON_TIME_FLIGHTS"), F.col("COMPLETED_FLIGHTS"), "ON_TIME_PERFORMANCE"),
        ratio(F.col("DELAYED_FLIGHTS"), F.col("COMPLETED_FLIGHTS"), "DELAY_RATE"),
        ratio(F.col("CANCELLED_FLIGHTS"), F.col("TOTAL_FLIGHTS"), "CANCELLATION_RATE"),
    )


def daily_airport_performance(silver: DataFrame) -> DataFrame:
    """Reference daily_airport_performance.py:7-70 — departure-side and
    arrival-side daily aggregates merged with a COALESCE-keyed full outer
    join."""
    dep = silver.groupBy(
        F.col("FLIGHT_DATE").alias("DEP_DATE"),
        F.col("ORIGIN_AIRPORT_CODE").alias("DEP_AIRPORT"),
    ).agg(
        F.count("*").alias("DEPARTURES"),
        conditional_count(F.col("IS_CANCELLED"), "CANCELLED_DEPARTURES"),
        conditional_avg(_operated(), F.col("DEP_DELAY_MINUTES"), "AVG_DEP_DELAY"),
    )
    arr = silver.groupBy(
        F.col("FLIGHT_DATE").alias("ARR_DATE"),
        F.col("DEST_AIRPORT_CODE").alias("ARR_AIRPORT"),
    ).agg(
        F.count("*").alias("ARRIVALS"),
        conditional_avg(_operated(), F.col("ARR_DELAY_MINUTES"), "AVG_ARR_DELAY"),
    )
    merged = outer_merge_coalesce(
        dep,
        arr,
        [("DEP_DATE", "ARR_DATE", "FLIGHT_DATE"), ("DEP_AIRPORT", "ARR_AIRPORT", "AIRPORT_CODE")],
    )
    return merged.select(
        "*",
        (F.coalesce(F.col("DEPARTURES"), F.lit(0)) + F.coalesce(F.col("ARRIVALS"), F.lit(0))).alias(
            "TOTAL_MOVEMENTS"
        ),
    )


def route_performance(silver: DataFrame) -> DataFrame:
    """Reference route_performance.py:7-38."""
    agg = silver.groupBy(
        "ROUTE_CODE", "ORIGIN_AIRPORT_CODE", "DEST_AIRPORT_CODE"
    ).agg(
        F.count("*").alias("TOTAL_FLIGHTS"),
        conditional_count(_operated(), "COMPLETED_FLIGHTS"),
        conditional_count(_on_time(), "ON_TIME_FLIGHTS"),
        conditional_avg(_operated(), F.col("DEP_DELAY_MINUTES"), "AVG_DEP_DELAY"),
        conditional_avg(_operated(), F.col("ARR_DELAY_MINUTES"), "AVG_ARR_DELAY"),
        F.avg("DISTANCE_MILES").alias("AVG_DISTANCE_MILES"),
        conditional_avg(_operated(), F.col("AVG_SPEED_MPH"), "AVG_SPEED_MPH"),
        F.countDistinct("AIRLINE_CODE").alias("AIRLINES_SERVING"),
    )
    return agg.select(
        "*",
        ratio(F.col("COMPLETED_FLIGHTS"), F.col("TOTAL_FLIGHTS"), "COMPLETION_RATE"),
        ratio(F.col("ON_TIME_FLIGHTS"), F.col("COMPLETED_FLIGHTS"), "ON_TIME_PERFORMANCE"),
    )
