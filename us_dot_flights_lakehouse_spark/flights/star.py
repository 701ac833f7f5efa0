"""Gold star schema: 5 dimensions + fact builder
(reference ``spark_jobs/gold_marts/star_schema/``).

Scale notes (100 TB):
- Every dim is tiny (calendar, minutes, carriers, airports, routes) and
  joins into the fact via explicit broadcast — the fact side never
  shuffles during the star build (reference fact_flights.py:36-61).
- Time-of-day FKs are computed ARITHMETICALLY from the 'HH:MM' strings
  instead of joining dim_time four times — the reference's manual
  join-elimination rewrite (fact_flights.py:11-32), preserved here: four
  broadcast joins of a 1440-row dim would still cost four hash probes per
  fact row for something a two-substring expression computes in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.operators.generators import (
    date_range_df,
    minute_of_day_df,
)
from us_dot_flights_lakehouse_spark.operators.joins import broadcast_star_join
from us_dot_flights_lakehouse_spark.operators.setops import union_distinct


def build_dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dim via sequence+explode (reference dim_date.py:10-30)."""
    spine = date_range_df(spark, start, end, "FULL_DATE")
    d = F.col("FULL_DATE")
    return spine.select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("DATE_KEY"),
        d,
        F.year(d).alias("YEAR"),
        F.quarter(d).alias("QUARTER"),
        F.month(d).alias("MONTH"),
        F.date_format(d, "MMM").alias("MONTH_NAME"),
        F.dayofmonth(d).alias("DAY_OF_MONTH"),
        F.weekofyear(d).alias("WEEK_OF_YEAR"),
        F.dayofweek(d).alias("DAY_OF_WEEK"),
        F.date_format(d, "EEEE").alias("DAY_NAME"),
        F.dayofweek(d).isin(1, 7).alias("IS_WEEKEND"),
    )


def build_dim_time(spark: SparkSession) -> DataFrame:
    """Minute-of-day dim via spark.range (reference dim_time.py:10-89)."""
    base = minute_of_day_df(spark, "TIME_KEY")
    hour = (F.col("TIME_KEY") / 60).cast("int")
    minute = F.col("TIME_KEY") % 60
    return base.select(
        "TIME_KEY",
        hour.alias("HOUR"),
        minute.alias("MINUTE"),
        F.concat_ws(
            ":",
            F.lpad(hour.cast("string"), 2, "0"),
            F.lpad(minute.cast("string"), 2, "0"),
        ).alias("TIME_STRING"),
        F.when(hour < 12, "AM").otherwise("PM").alias("AM_PM"),
        F.when(hour < 6, "NIGHT")
        .when(hour < 12, "MORNING")
        .when(hour < 18, "AFTERNOON")
        .otherwise("EVENING")
        .alias("TIME_PERIOD"),
        hour.between(9, 17).alias("IS_BUSINESS_HOURS"),
    )


def build_dim_airline(silver: DataFrame, carrier_lookup: DataFrame | None = None) -> DataFrame:
    """Distinct carriers (+ optional name lookup)
    (reference dim_airline.py:8-12)."""
    dim = silver.select(F.col("AIRLINE_CODE")).distinct()
    if carrier_lookup is not None:
        dim = dim.join(
            F.broadcast(carrier_lookup), dim.AIRLINE_CODE == carrier_lookup.Code, "left"
        ).select("AIRLINE_CODE", F.col("Description").alias("AIRLINE_NAME"))
    else:
        dim = dim.select("AIRLINE_CODE", F.col("AIRLINE_CODE").alias("AIRLINE_NAME"))
    return dim.withColumn("CREATED_AT", F.current_timestamp())


def build_dim_airport(silver: DataFrame) -> DataFrame:
    """Origin ∪ dest distinct airports (reference dim_airport.py:7-18)."""
    return union_distinct(
        silver.select(
            F.col("ORIGIN_AIRPORT_CODE").alias("AIRPORT_CODE"),
            F.col("ORIGIN_AIRPORT_ID").alias("AIRPORT_ID"),
        ),
        silver.select(
            F.col("DEST_AIRPORT_CODE").alias("AIRPORT_CODE"),
            F.col("DEST_AIRPORT_ID").alias("AIRPORT_ID"),
        ),
    )


def build_dim_route(silver: DataFrame) -> DataFrame:
    """Grouped route dim with decimal casts + distance bucketing
    (reference dim_route.py:9-41)."""
    agg = silver.groupBy(
        "ROUTE_CODE", "ORIGIN_AIRPORT_CODE", "DEST_AIRPORT_CODE"
    ).agg(
        F.count("*").alias("TOTAL_FLIGHTS"),
        F.avg("DISTANCE_MILES").cast("decimal(10,2)").alias("AVG_DISTANCE_MILES"),
        F.avg("DISTANCE_KM").cast("decimal(10,2)").alias("AVG_DISTANCE_KM"),
    )
    return agg.select(
        "*",
        F.when(F.col("AVG_DISTANCE_MILES") < 500, "SHORT_HAUL")
        .when(F.col("AVG_DISTANCE_MILES") < 1500, "MEDIUM_HAUL")
        .otherwise("LONG_HAUL")
        .alias("DISTANCE_CATEGORY"),
    )


def _hhmm_string_to_time_key(col: Column) -> Column:
    """'HH:MM' → minute-of-day TIME_KEY, arithmetically (the manual
    join-elimination; reference fact_flights.py:16-32 strips the colon
    with regexp and derives the key by expression)."""
    stripped = F.regexp_replace(col, ":", "").cast("int")
    return ((stripped / 100).cast("int") * 60 + stripped % 100).cast("int")


def build_fact_flights(
    silver: DataFrame,
    dim_date: DataFrame,
    dim_airline: DataFrame,
    dim_airport: DataFrame,
    dim_route: DataFrame,
) -> DataFrame:
    """Fact build: 4 arithmetic time FKs + 5 broadcast left joins + 22-col
    projection (reference fact_flights.py:10-92)."""
    # one withColumns batch (each key maps from an untouched input; a
    # chained withColumn re-analyzes the whole wide plan per call — r13)
    with_keys = silver.withColumns(
        {
            "DEP_TIME_KEY": _hhmm_string_to_time_key(F.col("ACTUAL_DEP_TIME")),
            "ARR_TIME_KEY": _hhmm_string_to_time_key(F.col("ACTUAL_ARR_TIME")),
            "CRS_DEP_TIME_KEY": _hhmm_string_to_time_key(
                F.col("SCHEDULED_DEP_TIME")
            ),
            "CRS_ARR_TIME_KEY": _hhmm_string_to_time_key(
                F.col("SCHEDULED_ARR_TIME")
            ),
        }
    )
    dd = dim_date.select("DATE_KEY", "FULL_DATE")
    da = dim_airline.select("AIRLINE_CODE").withColumnRenamed("AIRLINE_CODE", "DIM_AIRLINE_CODE")
    orig = dim_airport.select(
        F.col("AIRPORT_CODE").alias("O_CODE"), F.col("AIRPORT_ID").alias("ORIGIN_AIRPORT_KEY")
    )
    dest = dim_airport.select(
        F.col("AIRPORT_CODE").alias("D_CODE"), F.col("AIRPORT_ID").alias("DEST_AIRPORT_KEY")
    )
    dr = dim_route.select(F.col("ROUTE_CODE").alias("DIM_ROUTE_CODE"))

    fact = broadcast_star_join(
        with_keys,
        [
            (dd, with_keys.FLIGHT_DATE == dd.FULL_DATE),
            (da, with_keys.AIRLINE_CODE == da.DIM_AIRLINE_CODE),
            (orig, with_keys.ORIGIN_AIRPORT_CODE == orig.O_CODE),
            (dest, with_keys.DEST_AIRPORT_CODE == dest.D_CODE),
            (dr, with_keys.ROUTE_CODE == dr.DIM_ROUTE_CODE),
        ],
        how="left",
    )
    return fact.select(
        "DATE_KEY",
        "AIRLINE_CODE",
        "FLIGHT_NUMBER",
        "ORIGIN_AIRPORT_KEY",
        "DEST_AIRPORT_KEY",
        F.col("ROUTE_CODE"),
        "DEP_TIME_KEY",
        "ARR_TIME_KEY",
        "CRS_DEP_TIME_KEY",
        "CRS_ARR_TIME_KEY",
        "DEP_DELAY_MINUTES",
        "ARR_DELAY_MINUTES",
        "AIR_TIME_MINUTES",
        "DISTANCE_MILES",
        "DISTANCE_KM",
        "AVG_SPEED_MPH",
        "IS_CANCELLED",
        "IS_DIVERTED",
        "IS_ON_TIME",
        "IS_WEEKEND",
        "DEP_DELAY_CATEGORY",
        "ARR_DELAY_CATEGORY",
    )
