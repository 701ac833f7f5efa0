"""Source/sink tests (SURVEY.md §2.1): CSV scan variants, schema drift
reconciliation, evolving-schema reads, lineage columns, CSV export."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_dot_flights_lakehouse_spark.sources.readers import (
    evolved_read,
    read_csv,
    reconcile_schema,
    with_lineage,
)
from us_dot_flights_lakehouse_spark.sources.writers import export_single_csv


def _csv(path, header, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_csv_scan_inferred_vs_schema_enforced(spark, tmp_path):
    p = str(tmp_path / "feed" / "m1.csv")
    _csv(p, ["code", "n", "amt"], [("AA", 1, 1.5), ("DL", 2, 2.5)])

    inferred = read_csv(spark, p, infer=True)
    assert dict(inferred.dtypes) == {"code": "string", "n": "int", "amt": "double"}

    schema = T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )
    enforced = read_csv(spark, p, schema=schema)
    assert dict(enforced.dtypes)["n"] == "bigint"
    assert enforced.count() == 2


def test_reconcile_schema_rename_cast_add_drop(spark):
    target = T.StructType(
        [
            T.StructField("carrier", T.StringType()),
            T.StructField("fl_date", T.TimestampType()),
            T.StructField("delay", T.DoubleType()),
            T.StructField("new_col", T.IntegerType()),
        ]
    )
    feed = spark.createDataFrame(
        [("19805", "2025-01-01 08:00:00", "12.5", "junk")],
        "legacy_carrier string, fl_date string, delay string, extra string",
    )
    out = reconcile_schema(feed, target, renames={"legacy_carrier": "carrier"})
    assert out.columns == ["carrier", "fl_date", "delay", "new_col"]
    row = out.collect()[0]
    assert row["carrier"] == "19805"
    assert row["fl_date"].year == 2025  # string -> timestamp cast applied
    assert row["delay"] == 12.5
    assert row["new_col"] is None  # added as typed NULL; "extra" dropped

    # permissive-cast posture: garbage values null out instead of raising
    bad = spark.createDataFrame([("x", "not-a-date", "NaNope", "y")], feed.schema)
    assert reconcile_schema(bad, target, renames={"legacy_carrier": "carrier"}).collect()[
        0
    ]["delay"] is None


def test_evolved_read_merges_file_schemas(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode("append").parquet(
        path
    )
    spark.createDataFrame(
        [(2, "b", 9.0)], "id long, v string, score double"
    ).write.mode("append").parquet(path)
    out = evolved_read(spark, path)
    assert set(out.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got[1] is None and got[2] == 9.0  # old file surfaces NULL for new col


def test_lineage_columns(spark, tmp_path):
    p = str(tmp_path / "lin" / "f.csv")
    _csv(p, ["id"], [(1,), (2,)])
    out = with_lineage(read_csv(spark, p, infer=True)).collect()
    assert all(r["source_file"].endswith("f.csv") for r in out)
    assert all(r["ingestion_timestamp"] is not None for r in out)


def test_export_single_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "export")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    export_single_csv(df, path)
    files = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(files) == 1  # coalesce(1): exactly one data file
    back = spark.read.option("header", "true").csv(path)
    assert sorted(r["name"] for r in back.collect()) == ["x", "y"]
