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


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSON-lines export — the corpus interchange format. Prefer
    ``compression='zstd'`` (or none) at scale: both stay line-splittable
    for re-reads, gzip does not. Partition count = file count; coalesce
    upstream if the consumer wants few files."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC export via the built-in native writer (zlib default; columnar,
    stripe-level stats for pushdown on re-read)."""
    df.write.mode(mode).orc(path)


#: leaf-name prefix for the retired copy of a partition dir during an
#: atomic publish — dot-prefixed so Spark/Hive listing ignores it (a
#: ``day=X.__old`` SUFFIX would be parsed as a bogus partition value)
_OLD_PREFIX = "._old."
#: staging dir inside the table path; leading underscore makes Spark/Hive
#: readers skip it, and same-dir placement guarantees same-filesystem rename
_STAGING = "_staging"


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _partition_rel_dirs(rows, partition_by: list[str]) -> list[str]:
    """Hive-style relative dirs (``day=2024-01-02/region=EU``) for the
    collected partition-value rows. Values are assumed path-safe (dates,
    codes, integer keys — true for every table here); NULL maps to Hive's
    default partition name."""
    return [
        "/".join(
            f"{c}={'__HIVE_DEFAULT_PARTITION__' if row[c] is None else row[c]}"
            for c in partition_by
        )
        for row in rows
    ]


def publish_partitions_atomic(
    spark, staging: str, live: str, rel_dirs: Sequence[str]
) -> None:
    """Two-phase commit of staged partition dirs into a live table: per
    partition, retire the live dir to ``<dir>.__old``, rename the staged
    dir into place, then drop the retired copy. Dir rename is atomic on
    HDFS/POSIX, so a crash at ANY point leaves every partition fully-old
    or fully-new — never a mix of old and new files in one dir (the
    failure mode of overwrite-in-place). Leftover ``.__old`` dirs from a
    crashed publish are cleaned on the next run.

    Caveats, stated honestly: single-writer protocol (concurrent writers
    need a transactional table format — the reference uses Delta for
    exactly this); a reader listing the table during the two renames can
    see a partition momentarily absent; object stores emulate rename as
    copy+delete, weakening atomicity to per-file."""
    fs, jvm = _hadoop_fs(spark, live)
    hpath = jvm.org.apache.hadoop.fs.Path
    for rel in rel_dirs:
        src, dst = hpath(f"{staging}/{rel}"), hpath(f"{live}/{rel}")
        parent, _, leaf = rel.rpartition("/")
        prefix = f"{live}/{parent}/" if parent else f"{live}/"
        old = hpath(f"{prefix}{_OLD_PREFIX}{leaf}")
        if fs.exists(old):  # leftover from a crashed previous publish
            fs.delete(old, True)
        fs.mkdirs(dst.getParent())
        had_prev = fs.exists(dst)
        if had_prev and not fs.rename(dst, old):
            raise IOError(f"atomic publish: cannot retire {dst}")
        if not fs.rename(src, dst):
            if had_prev:
                fs.rename(old, dst)  # roll the retirement back
            raise IOError(f"atomic publish: cannot publish {src} -> {dst}")
        if had_prev:
            fs.delete(old, True)


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
    (left-anti), then updates append. The rewrite stages to ``_staging``
    inside the table path and commits via ``publish_partitions_atomic`` —
    a crash mid-job leaves the live table byte-identical (staging never
    read) or torn only at whole-partition granularity mid-publish, never
    with mixed old/new files in one dir. At 100 TB an incremental day
    rewrites one day, not the table."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    spark = updates.sparkSession
    try:
        existing = spark.read.format(fmt).load(path)
    except AnalysisException:
        write_partitioned(updates, path, partition_by=partition_by, fmt=fmt)
        return
    touched_rows = updates.select(*partition_by).distinct().collect()
    touched = spark.createDataFrame(touched_rows, updates.select(*partition_by).schema)
    # partition-pruned read: join on partition cols keeps only touched dirs
    keep = (
        existing.join(F.broadcast(touched), partition_by, "left_semi")
        .join(updates.select(*keys), keys, "left_anti")
    )
    out = keep.unionByName(updates.select(*existing.columns))
    staging = f"{path}/{_STAGING}"
    write_partitioned(out, staging, partition_by=partition_by, fmt=fmt)
    publish_partitions_atomic(
        spark, staging, path, _partition_rel_dirs(touched_rows, partition_by)
    )
    fs, jvm = _hadoop_fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


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
    keyed repartition + atomic per-partition publish here, so a crashed
    compaction never corrupts the table it was tidying)."""
    df = spark.read.format(fmt).load(path)
    n = max(1, df.count() // rows_per_file)
    parts = df.select(*partition_by).distinct().collect()
    staging = f"{path}/{_STAGING}"
    write_partitioned(
        df.repartition(n, *partition_by),
        staging,
        partition_by=partition_by,
        fmt=fmt,
    )
    publish_partitions_atomic(
        spark, staging, path, _partition_rel_dirs(parts, partition_by)
    )
    fs, jvm = _hadoop_fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


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
