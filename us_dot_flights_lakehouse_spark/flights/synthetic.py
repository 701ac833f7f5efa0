"""Deterministic synthetic flight feed for tests/demos (the testdata has
no flights-domain table; this generator produces schema-exact rows with
seeded randomness so pipeline tests are reproducible)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from us_dot_flights_lakehouse_spark.flights.schema import FLIGHT_SCHEMA

CARRIERS = ("AA", "DL", "UA", "WN", "B6")
AIRPORTS = (("JFK", 10135), ("LAX", 12892), ("ORD", 13930), ("ATL", 10397), ("DFW", 11298))


def synthetic_flights(spark: SparkSession, n: int = 200, seed: int = 7) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    base = datetime(2025, 1, 1)
    for i in range(n):
        day = base + timedelta(days=rng.randrange(31))
        carrier = rng.choice(CARRIERS)
        (origin, oid), (dest, did) = rng.sample(AIRPORTS, 2)
        cancelled = 1.0 if rng.random() < 0.05 else 0.0
        diverted = 1.0 if (not cancelled and rng.random() < 0.01) else 0.0
        crs_dep = rng.randrange(5, 23) * 100 + rng.randrange(60)
        dep_delay = float(rng.choice([-5, -2, 0, 3, 10, 22, 45, 95]))
        air_time = float(rng.randrange(60, 360))
        distance = float(rng.randrange(200, 2800))
        arr_delay = dep_delay + rng.choice([-10.0, -5.0, 0.0, 5.0, 15.0])
        crs_arr = (crs_dep + 200) % 2400
        if cancelled:
            dep_time = arr_time = None
            dep_delay = arr_delay = air_time = None  # type: ignore[assignment]
        else:
            dep_time = str((crs_dep + int(dep_delay)) % 2400)
            arr_time = str((crs_arr + int(arr_delay)) % 2400)
        rows.append(
            (
                day,
                carrier,
                1000 + i,
                origin,
                oid,
                dest,
                did,
                str(crs_dep),
                dep_time,
                dep_delay,
                max(dep_delay, 0.0) if dep_delay is not None else None,
                str(crs_arr),
                arr_time,
                arr_delay,
                max(arr_delay, 0.0) if arr_delay is not None else None,
                cancelled,
                diverted,
                air_time,
                distance,
            )
        )
    return spark.createDataFrame(rows, FLIGHT_SCHEMA)
