"""Batch sinks (SURVEY.md §2.1 S5-S6, §2.9 X2-X3).

Scale notes (100 TB):
- The reference's ``mode("overwrite")``-everywhere is its biggest scale
  anti-pattern; ``write_partitioned`` supports dynamic partition overwrite
  so an incremental run only rewrites touched partitions.
- Pre-write keyed repartition (reference build_fact_flights.py:82-85)
  controls file count/size; the ``rows_per_partition`` heuristic mirrors
  its ~100K-rows floor-200 sizing and prevents the small-files problem
  that kills object-store listings at scale.
- ``coalesce(1)`` single-file export is for small marts ONLY — it
  serializes the whole write through one task by design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    repartition_rows: int | None = None,
    rows_per_partition: int = 100_000,
    min_partitions: int = 200,
    dynamic: bool = False,
) -> None:
    """S5: partitioned columnar sink (reference download_and_ingest.py:204-209,
    build_fact_flights.py:82-90).

    ``repartition_rows``: pass a (possibly estimated) row count to apply the
    reference's file-sizing heuristic ``max(min_partitions, rows // rows_per_partition)``
    keyed on the partition columns so each output partition-dir gets few,
    large files.
    """
    out = df
    if repartition_rows is not None and partition_by:
        n = max(min_partitions, repartition_rows // rows_per_partition)
        out = out.repartition(n, *partition_by)
    writer = out.write.format(fmt).mode(mode)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def export_single_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6/X3: coalesce(1) + header CSV export for small marts/samples
    (reference export_aggregates.py:66-69)."""
    df.coalesce(1).write.format("csv").option("header", "true").mode(mode).save(path)


def merge_upsert_partitioned(
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str],
    fmt: str = "parquet",
) -> None:
    """Key-level MERGE (upsert) on a partitioned parquet table by partition
    rewrite — the open-format stand-in for Delta ``MERGE INTO`` (the
    reference overwrites whole tables instead; SURVEY.md §7 M7 names that
    its biggest scale anti-pattern).

    Only partitions PRESENT IN ``updates`` are read and rewritten: existing
    rows of those partitions survive unless their key matches an update
    (left-anti), then updates append. Dynamic partition overwrite leaves
    every untouched partition's files physically untouched — at 100 TB an
    incremental day rewrites one day, not the table. Not transactional
    across concurrent writers (that is what a table format adds); the
    rewrite itself is atomic per partition dir."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    spark = updates.sparkSession
    try:
        existing = spark.read.format(fmt).load(path)
    except AnalysisException:
        write_partitioned(updates, path, partition_by=partition_by, fmt=fmt)
        return
    touched = updates.select(*partition_by).distinct()
    # partition-pruned read: join on partition cols keeps only touched dirs
    keep = (
        existing.join(F.broadcast(touched), partition_by, "left_semi")
        .join(updates.select(*keys), keys, "left_anti")
    )
    out = keep.unionByName(updates.select(*existing.columns))
    write_partitioned(
        out, path, partition_by=partition_by, fmt=fmt, dynamic=True
    )


def compact_partitions(
    spark,
    path: str,
    partition_by: list[str],
    rows_per_file: int = 1_000_000,
    fmt: str = "parquet",
) -> None:
    """Small-file compaction: rewrite a partitioned table with file counts
    sized by ``rows_per_file`` (streaming appends and per-batch upserts
    accrete small files; object-store listing cost makes periodic
    compaction mandatory at scale — Delta OPTIMIZE's job, done with a
    keyed repartition here)."""
    df = spark.read.format(fmt).load(path)
    n = max(1, df.count() // rows_per_file)
    write_partitioned(
        df.repartition(n, *partition_by),
        path,
        partition_by=partition_by,
        fmt=fmt,
        dynamic=True,
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed table write — pre-shuffles data into ``n_buckets`` hash
    buckets on ``bucket_cols`` at WRITE time so that later joins and
    aggregations on those keys read co-located data and skip the shuffle
    entirely (the planner sees the bucketing spec via the catalog and
    drops the Exchange; with matching ``sort_cols`` it drops the Sort
    too).

    This is the 100 TB play for repeatedly-joined fact tables: pay one
    shuffle at ingest, then every downstream fact-to-fact join on the
    bucket key is exchange-free. Both sides must agree on bucket count
    and key. Requires ``saveAsTable`` (bucketing metadata lives in the
    catalog, not the files); ``path`` makes it an external table.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Range-clustered write (z-order-lite): repartitionByRange assigns
    contiguous key ranges to output files and sortWithinPartitions orders
    rows inside each, so every file's footer min/max stats cover a
    narrow, disjoint key range. Downstream scans with predicates on
    ``cluster_cols`` then skip whole files/row-groups on stats alone —
    the open-format equivalent of clustering/z-ordering, and the main
    lever for selective reads over 100 TB of history. One range-exchange
    (sampled boundaries) at write time is the whole cost."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 5,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Multi-column interleaved (Z-order) clustered write: each cluster
    column is quantile-binned to ``2**bits`` ranks (one approxQuantile
    pass), the per-column bin bits are interleaved into a Morton z-value,
    and files are range-partitioned + sorted on that z-value.

    Where ``write_range_clustered`` gives perfect file-skipping on ONE
    key and none on the others, z-ordering gives every listed column
    footer ranges covering only ~(1/n_files)^(1/len(cols)) of its
    domain — the layout that serves selective scans on EITHER column of
    100 TB of history. Cost: one sampling pass + one range exchange.
    """
    from pyspark.sql import functions as F

    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        cuts = df.approxQuantile(c, probs, 0.01)
        cut_arr = F.array(*[F.lit(float(x)) for x in cuts])
        bin_col = F.size(
            F.filter(cut_arr, lambda b: F.col(c).cast("double") >= b)
        ).cast("long")
        for bit in range(bits):
            z = z + (
                F.shiftright(bin_col, bit).bitwiseAND(F.lit(1))
                * F.lit(1 << (bit * len(cols) + ci))
            ).cast("long")
    out = df.withColumn("__z", z)
    (
        out.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )
