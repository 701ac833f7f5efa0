"""Bit-equality pin for the driver-side histogram percentile path
(operators/quantiles.py) against Spark's own ``percentile()`` — the
contract every rewired caller (a20/a23/the range advisor) relies on
for its unchanged DuckDB oracle."""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.operators.quantiles import (
    collect_value_histogram,
    histogram_groups,
    percentiles_from_counts,
)

FRACS = [0.0, 0.05, 0.25, 0.5, 0.75, 0.9, 1.0]


def bits(x):
    return None if x is None else struct.pack("<d", x)


def _spark_grouped_percentiles(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    got = df.groupBy("g").agg(
        F.percentile("v", F.lit(FRACS)).alias("qs"),
        F.count("*").alias("n_total"),
    )
    return {r["g"]: (r["qs"], r["n_total"]) for r in got.collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_driver_percentiles_bit_equal_spark(spark, seed):
    rng = random.Random(seed)
    rows = []
    for g, n in (("a", 173), ("b", 40), ("c", 1), ("allnull", 5)):
        for _ in range(n):
            if g == "allnull" or rng.random() < 0.1:
                v = None
            elif rng.random() < 0.3:
                v = float(rng.randint(0, 8))  # heavy ties
            else:
                v = rng.uniform(-1e6, 1e6)
            rows.append((g, v))
    expected = _spark_grouped_percentiles(spark, rows)

    df = spark.createDataFrame(rows, "g string, v double")
    tbl = collect_value_histogram(df, ["g"], ["v"])
    assert tbl is not None
    seen = {}
    for key, vals, cnts, n_total in histogram_groups(tbl, ["g"], "v"):
        seen[key[0]] = (percentiles_from_counts(vals, cnts, FRACS), n_total)
    assert set(seen) == set(expected)
    for g, (qs, n_total) in expected.items():
        got_qs, got_n = seen[g]
        assert got_n == n_total, g
        if qs is None:
            assert all(q is None for q in got_qs), g
        else:
            assert [bits(q) for q in got_qs] == [bits(q) for q in qs], g


def _rows_set(df):
    return sorted(
        (
            tuple(bits(v) if isinstance(v, float) else v for v in r)
            for r in df.collect()
        ),
        key=repr,
    )


def test_a20_a23_driver_path_equals_plan_side(spark, monkeypatch):
    """The rewired queries' driver path must equal their plan-side
    fallback bit-for-bit, including the NULL edges the real tables never
    exercise: NULL flags (dropped by the bounds/med join), NULL values
    (bucket 0, excluded from min/max), and an all-NULL-value group
    (bnds NULL → size(filter(NULL)) = -1 bucket; med/mad NULL)."""
    import us_dot_flights_lakehouse_spark.queries.agg_q as agg_q

    rng = random.Random(7)
    rows = []
    for g, n in (("A", 300), ("B", 57), (None, 20), ("allnull", 9)):
        for _ in range(n):
            v = (
                None
                if g == "allnull" or rng.random() < 0.08
                else round(rng.uniform(900.0, 90000.0), 2)
            )
            rows.append((g, v))
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    ).withColumn("l_discount", (F.col("l_extendedprice") % 10) / 100)

    def fake_read_table(s, d, t):
        return li

    monkeypatch.setattr(agg_q, "read_table", fake_read_table)
    li = li.withColumn(
        "l_quantity",
        F.when(
            F.pmod(F.coalesce(F.col("l_extendedprice"), F.lit(7.0)), 11) < 1, None
        ).otherwise(F.pmod(F.col("l_extendedprice"), F.lit(50.0))),
    )
    for fn in (
        agg_q.a20_equidepth_histogram,
        agg_q.a23_mad_robust_stats,
        agg_q.a30_weighted_median,
    ):
        driver = fn(spark, "unused")
        import us_dot_flights_lakehouse_spark.operators.quantiles as q

        # restore the SAVED module value, not a re-typed constant, so the
        # loop's later iterations track production if the cap ever moves
        saved_cap = q.DRIVER_HIST_MAX_ROWS
        monkeypatch.setattr(q, "DRIVER_HIST_MAX_ROWS", 0)
        plan_side = fn(spark, "unused")
        monkeypatch.setattr(q, "DRIVER_HIST_MAX_ROWS", saved_cap)
        assert _rows_set(driver) == _rows_set(plan_side), fn.__name__


def test_histogram_cap_and_nan_fall_back(spark):
    df = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    assert collect_value_histogram(df, ["g"], ["v"], cap=99) is None
    assert collect_value_histogram(df, ["g"], ["v"], cap=100) is not None
    nan_df = spark.createDataFrame(
        [("g", 1.0), ("g", float("nan"))], "g string, v double"
    )
    assert collect_value_histogram(nan_df, ["g"], ["v"]) is None
    # NULLs are fine (carried, not NaN-conflated)
    null_df = spark.createDataFrame(
        [("g", 1.0), ("g", None)], "g string, v double"
    )
    assert collect_value_histogram(null_df, ["g"], ["v"]) is not None
