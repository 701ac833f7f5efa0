"""Canonical flight-feed schema (reference ``configs/data_schema.py:9-29``):
19 columns — timestamps, carrier/airport codes, HHMM local-time strings
(kept as strings/ints deliberately; see SURVEY.md §7.3 on timezone quirks),
delay/distance doubles, 0/1 cancellation flags."""

from __future__ import annotations

from pyspark.sql import types as T

FLIGHT_SCHEMA = T.StructType(
    [
        T.StructField("FL_DATE", T.TimestampType()),
        T.StructField("OP_UNIQUE_CARRIER", T.StringType()),
        T.StructField("OP_CARRIER_FL_NUM", T.IntegerType()),
        T.StructField("ORIGIN", T.StringType()),
        T.StructField("ORIGIN_AIRPORT_ID", T.IntegerType()),
        T.StructField("DEST", T.StringType()),
        T.StructField("DEST_AIRPORT_ID", T.IntegerType()),
        T.StructField("CRS_DEP_TIME", T.StringType()),  # HHMM
        T.StructField("DEP_TIME", T.StringType()),  # HHMM
        T.StructField("DEP_DELAY", T.DoubleType()),
        T.StructField("DEP_DELAY_NEW", T.DoubleType()),
        T.StructField("CRS_ARR_TIME", T.StringType()),  # HHMM
        T.StructField("ARR_TIME", T.StringType()),  # HHMM
        T.StructField("ARR_DELAY", T.DoubleType()),
        T.StructField("ARR_DELAY_NEW", T.DoubleType()),
        T.StructField("CANCELLED", T.DoubleType()),  # 0.0 / 1.0
        T.StructField("DIVERTED", T.DoubleType()),  # 0.0 / 1.0
        T.StructField("AIR_TIME", T.DoubleType()),
        T.StructField("DISTANCE", T.DoubleType()),
    ]
)

#: silver output partitioning (reference flights_silver_transform.py:125)
SILVER_PARTITION_COLS = ("FLIGHT_DATE", "AIRLINE_CODE")
