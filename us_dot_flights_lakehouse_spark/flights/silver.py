"""Silver transform: clean → enrich → final renamed projection
(reference ``flights_silver_transform.py:64-123`` — the 34-column silver
schema), plus the fail-closed quality gate the reference applies at this
layer (``flights_silver_transform.py:157-162``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.flights.cleaner import clean_flights
from us_dot_flights_lakehouse_spark.flights.enricher import enrich_flights
from us_dot_flights_lakehouse_spark.quality.checks import QualitySuite

#: (source, silver name) pairs of the final projection
SILVER_COLUMNS: tuple[tuple[str, str], ...] = (
    ("FLIGHT_DATE", "FLIGHT_DATE"),
    ("OP_UNIQUE_CARRIER", "AIRLINE_CODE"),
    ("OP_CARRIER_FL_NUM", "FLIGHT_NUMBER"),
    ("ORIGIN", "ORIGIN_AIRPORT_CODE"),
    ("ORIGIN_AIRPORT_ID", "ORIGIN_AIRPORT_ID"),
    ("DEST", "DEST_AIRPORT_CODE"),
    ("DEST_AIRPORT_ID", "DEST_AIRPORT_ID"),
    ("CRS_DEP_TIME", "SCHEDULED_DEP_TIME"),
    ("DEP_TIME", "ACTUAL_DEP_TIME"),
    ("DEP_DELAY", "DEP_DELAY_MINUTES"),
    ("CRS_ARR_TIME", "SCHEDULED_ARR_TIME"),
    ("ARR_TIME", "ACTUAL_ARR_TIME"),
    ("ARR_DELAY", "ARR_DELAY_MINUTES"),
    ("CANCELLED_BOOL", "IS_CANCELLED"),
    ("DIVERTED_BOOL", "IS_DIVERTED"),
    ("AIR_TIME", "AIR_TIME_MINUTES"),
    ("DISTANCE", "DISTANCE_MILES"),
    ("DISTANCE_KM", "DISTANCE_KM"),
    ("DEP_DELAY_CATEGORY", "DEP_DELAY_CATEGORY"),
    ("ARR_DELAY_CATEGORY", "ARR_DELAY_CATEGORY"),
    ("AVG_SPEED_MPH", "AVG_SPEED_MPH"),
    ("ROUTE_CODE", "ROUTE_CODE"),
    ("IS_WEEKEND", "IS_WEEKEND"),
    ("IS_ON_TIME", "IS_ON_TIME"),
    ("DATA_QUALITY_SCORE", "DATA_QUALITY_SCORE"),
)


def silver_transform(bronze: DataFrame) -> DataFrame:
    """clean → enrich → rename/project. Pure plan construction: the whole
    silver stage collapses into one codegen'd pass over the bronze scan."""
    enriched = enrich_flights(clean_flights(bronze))
    return enriched.select(
        *[F.col(src).alias(dst) for src, dst in SILVER_COLUMNS]
    )


def silver_quality_suite() -> QualitySuite:
    """Fail-closed silver gate (reference silver_expectations.py:54-187
    subset: code lengths, delay ranges, score domain, category sets)."""
    return (
        QualitySuite("silver_flights")
        .expect_row_count_at_least(1)
        .expect_column_exists("FLIGHT_DATE")
        .expect_column_exists("AIRLINE_CODE")
        .expect_length_between("ORIGIN_AIRPORT_CODE", 3, 3)
        .expect_length_between("DEST_AIRPORT_CODE", 3, 3)
        .expect_length_between("AIRLINE_CODE", 2, 3)
        .expect_values_between("DISTANCE_MILES", 0, 20000)
        .expect_values_between("DATA_QUALITY_SCORE", 0.0, 1.0)
        .expect_values_in_set(
            "DEP_DELAY_CATEGORY",
            ("UNKNOWN", "ON_TIME_OR_EARLY", "MINOR_DELAY", "MODERATE_DELAY", "SEVERE_DELAY"),
        )
        .expect_null_rate_at_most("FLIGHT_DATE", 0.0)
    )
