"""Medallion orchestration: bronze ingest → silver transform → gold build
(reference entry points download_and_ingest.py / flights_silver_transform.py
/ build_all_dimensions.py + build_fact_flights.py + build_all_aggregates.py,
SURVEY.md §3).

Differences from the reference, by design (scale):
- Partitioned parquet writes with dynamic partition overwrite instead of
  table-wide overwrite — an incremental month only rewrites its own
  partitions.
- The fact write applies the reference's file-sizing heuristic
  (~100K rows/partition, floor 200) via write_partitioned.
- Bronze gate is warn-only, silver gate fail-closed — exactly the
  reference's posture (§5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.flights.marts import (
    daily_airline_performance,
    daily_airport_performance,
    route_performance,
)
from us_dot_flights_lakehouse_spark.flights.silver import (
    silver_quality_suite,
    silver_transform,
)
from us_dot_flights_lakehouse_spark.flights.star import (
    build_dim_airline,
    build_dim_airport,
    build_dim_date,
    build_dim_route,
    build_dim_time,
    build_fact_flights,
)
from us_dot_flights_lakehouse_spark.quality.checks import QualitySuite
from us_dot_flights_lakehouse_spark.sources.readers import with_lineage
from us_dot_flights_lakehouse_spark.sources.writers import write_partitioned


@dataclass
class LakehousePaths:
    root: str

    @property
    def bronze(self) -> str:
        return f"{self.root}/bronze/flights"

    @property
    def silver(self) -> str:
        return f"{self.root}/silver/flights"

    def gold(self, table: str) -> str:
        return f"{self.root}/gold/{table}"


def bronze_quality_suite() -> QualitySuite:
    """Warn-only bronze checks (reference bronze_expectations.py:50-76)."""
    return (
        QualitySuite("bronze_flights")
        .expect_row_count_at_least(1)
        .expect_column_exists("FL_DATE")
        .expect_column_exists("OP_UNIQUE_CARRIER")
        .expect_null_rate_at_most("OP_UNIQUE_CARRIER", 0.01)
        .expect_values_between("DISTANCE", 0, 20000)
    )


def run_bronze(
    spark: SparkSession,
    raw: DataFrame,
    paths: LakehousePaths,
    airport_lookup: DataFrame | None = None,
    carrier_lookup: DataFrame | None = None,
) -> DataFrame:
    """Bronze: lookup enrichment (two aliased joins of ONE airport lookup +
    carrier lookup, all broadcast — reference download_and_ingest.py:134-155)
    + lineage columns + partitioned write."""
    df = raw
    if airport_lookup is not None:
        o = airport_lookup.alias("o")
        d = airport_lookup.alias("d")
        df = (
            df.join(
                F.broadcast(o),
                df.ORIGIN_AIRPORT_ID.cast("string") == F.col("o.Code"),
                "left",
            )
            .withColumnRenamed("Description", "ORIGIN_AIRPORT_NAME")
            .drop("Code")
            .join(
                F.broadcast(d),
                df.DEST_AIRPORT_ID.cast("string") == F.col("d.Code"),
                "left",
            )
            .withColumnRenamed("Description", "DEST_AIRPORT_NAME")
            .drop("Code")
        )
    if carrier_lookup is not None:
        df = (
            df.join(
                F.broadcast(carrier_lookup),
                df.OP_UNIQUE_CARRIER == carrier_lookup.Code,
                "left",
            )
            .withColumnRenamed("Description", "CARRIER_NAME")
            .drop("Code")
        )
    df = with_lineage(df, partition_date_col="FL_DATE")
    bronze_quality_suite().validate(df, fail_closed=False)
    write_partitioned(df, paths.bronze, partition_by=["partition_date"], dynamic=True)
    return spark.read.parquet(paths.bronze)


def run_silver(spark: SparkSession, paths: LakehousePaths) -> DataFrame:
    bronze = spark.read.parquet(paths.bronze)
    silver = silver_transform(bronze)
    silver_quality_suite().validate(silver, fail_closed=True)
    write_partitioned(silver, paths.silver, partition_by=["AIRLINE_CODE"], dynamic=True)
    return spark.read.parquet(paths.silver)


#: per-dim primary key for the gold uniqueness gates
_DIM_PKS = {
    "dim_date": "DATE_KEY",
    "dim_time": "TIME_KEY",
    "dim_airline": "AIRLINE_CODE",
    "dim_airport": "AIRPORT_CODE",
    "dim_route": "ROUTE_CODE",
}


def gold_quality_suites() -> dict[str, QualitySuite]:
    """Gold gates (reference gold_expectations.py:59-396): every dim's PK
    is non-null and UNIQUE; the fact's FKs stay within null bounds (left
    joins may miss — the reference probes null-FK % at
    build_fact_flights.py:49-54) and flag/measure domains hold."""
    suites = {
        name: QualitySuite(name)
        .expect_column_exists(pk)
        .expect_null_rate_at_most(pk, 0.0)
        .expect_unique(pk)
        for name, pk in _DIM_PKS.items()
    }
    suites["fact_flights"] = (
        QualitySuite("fact_flights")
        .expect_row_count_at_least(1)
        .expect_null_rate_at_most("DATE_KEY", 0.01)
        .expect_null_rate_at_most("ORIGIN_AIRPORT_KEY", 0.01)
        .expect_null_rate_at_most("DEST_AIRPORT_KEY", 0.01)
        .expect_values_between("DISTANCE_MILES", 0, 20000)
        .expect_values_in_set("IS_CANCELLED", (True, False))
    )
    return suites


def run_gold(spark: SparkSession, paths: LakehousePaths) -> dict[str, DataFrame]:
    """Dims off ONE cached silver read (reference build_all_dimensions.py:46-58),
    then fact (broadcast star join + keyed repartition write), then marts."""
    silver = spark.read.parquet(paths.silver).cache()
    try:
        bounds = silver.agg(
            F.min("FLIGHT_DATE").alias("lo"), F.max("FLIGHT_DATE").alias("hi")
        ).collect()[0]
        dims = {
            "dim_date": build_dim_date(spark, str(bounds["lo"]), str(bounds["hi"])),
            "dim_time": build_dim_time(spark),
            "dim_airline": build_dim_airline(silver),
            "dim_airport": build_dim_airport(silver),
            "dim_route": build_dim_route(silver),
        }
        for name, dim in dims.items():
            write_partitioned(dim, paths.gold(name))

        fact = build_fact_flights(
            silver, dims["dim_date"], dims["dim_airline"], dims["dim_airport"],
            dims["dim_route"],
        )
        suites = gold_quality_suites()
        for name, dim in dims.items():
            suites[name].validate(dim, fail_closed=True)  # PK uniqueness gates
        suites["fact_flights"].validate(fact, fail_closed=False)  # FK probe, warn-only
        n_rows = silver.count()  # cached — cheap; sizes the fact write
        write_partitioned(
            fact, paths.gold("fact_flights"), partition_by=["DATE_KEY"],
            repartition_rows=n_rows,
        )

        marts = {
            "daily_airline_performance": daily_airline_performance(silver),
            "daily_airport_performance": daily_airport_performance(silver),
            "route_performance": route_performance(silver),
        }
        for name, mart in marts.items():
            write_partitioned(mart, paths.gold(name))
    finally:
        silver.unpersist()
    return {
        name: spark.read.parquet(paths.gold(name))
        for name in (
            "dim_date dim_time dim_airline dim_airport dim_route fact_flights "
            "daily_airline_performance daily_airport_performance route_performance"
        ).split()
    }


def run_all(
    spark: SparkSession,
    raw: DataFrame,
    root: str,
    airport_lookup: DataFrame | None = None,
    carrier_lookup: DataFrame | None = None,
) -> dict[str, DataFrame]:
    paths = LakehousePaths(root)
    run_bronze(spark, raw, paths, airport_lookup, carrier_lookup)
    run_silver(spark, paths)
    return run_gold(spark, paths)
