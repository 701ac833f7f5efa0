"""Snapshot-versioned parquet tables: ACID overwrite + time travel on a
plain filesystem, no table-format dependency.

The reference gets ACID overwrite and ``versionAsOf`` time travel from
Delta (``spark_jobs/bronze_ingest/download_and_ingest.py:204-209``,
``configs/spark_config.py``). This module reproduces the snapshot
semantics with a rename-based commit protocol:

    table/
      v=00001/            snapshot data (parquet) + _COMMITTED marker
      v=00002/
      _staging_v00003/    in-flight write (underscore dir — readers skip)

Commit protocol (single writer):
1. write the DataFrame to ``_staging_v<N>`` (crash here: orphan staging
   dir, invisible to readers, cleaned by the next writer);
2. rename ``_staging_v<N>`` → ``v=<N>`` (atomic dir rename; crash after:
   data dir exists but carries no marker — still invisible);
3. create the empty ``v=<N>/_COMMITTED`` marker (single-file create =
   the atomic commit point).

Readers resolve "latest" as the max v-dir WITH a marker, so every crash
window leaves the previous snapshot fully readable — the property plain
``mode("overwrite")`` lacks (it deletes before it writes).

Scale notes (100 TB): a snapshot commit adds two metadata ops on top of
the data write, independent of data size; old snapshots retain storage
until ``vacuum_snapshots``. Object stores emulate dir rename as
copy+delete — there, step 2 weakens to per-file atomicity and a real
table format (Delta/Iceberg) is the production answer; the protocol and
API surface here are deliberately the same shape so callers can swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_dot_flights_lakehouse_spark.sources.writers import _hadoop_fs

_MARKER = "_COMMITTED"
_V_WIDTH = 5


def _vdir(version: int) -> str:
    return f"v={version:0{_V_WIDTH}d}"


def snapshot_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions, ascending. Uncommitted v-dirs (crashed
    between rename and marker) and staging dirs are excluded."""
    fs, jvm = _hadoop_fs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/{name}/{_MARKER}")):
                out.append(v)
    return sorted(out)


def write_snapshot(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the next snapshot of the table at ``path`` and
    return the new version number. The previous snapshot stays readable
    at every instant (see module docstring for the crash analysis).

    SINGLE WRITER REQUIRED: the orphan cleanup below deletes any v-dir
    that lacks a ``_COMMITTED`` marker and any ``_staging_v*`` dir, so a
    second concurrent writer racing between its rename and marker-create
    would have its in-flight commit destroyed. Serialize writers
    externally (scheduler lock / one producing job per table) — this
    format deliberately trades Delta/Iceberg-style optimistic concurrency
    for zero sidecar dependencies."""
    spark = df.sparkSession
    fs, jvm = _hadoop_fs(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    versions = snapshot_versions(spark, path)
    next_v = (versions[-1] + 1) if versions else 1
    # clean any orphan staging / unmarked v-dirs from a crashed writer
    root = hpath(path)
    if fs.exists(root):
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            orphan_staging = name.startswith("_staging_v")
            orphan_vdir = (
                status.isDirectory()
                and name.startswith("v=")
                and not fs.exists(hpath(f"{path}/{name}/{_MARKER}"))
            )
            if orphan_staging or orphan_vdir:
                fs.delete(status.getPath(), True)
    staging = f"{path}/_staging_v{next_v:0{_V_WIDTH}d}"
    df.write.mode("overwrite").parquet(staging)
    live = hpath(f"{path}/{_vdir(next_v)}")
    if not fs.rename(hpath(staging), live):
        raise IOError(f"snapshot commit: cannot rename {staging} -> {live}")
    fs.create(hpath(f"{path}/{_vdir(next_v)}/{_MARKER}"), True).close()
    return next_v


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot — the latest committed one, or ``version`` for time
    travel (the reference's Delta ``versionAsOf``)."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"snapshot v{version} not committed at {path}; have {versions}"
        )
    return spark.read.parquet(f"{path}/{_vdir(version)}")


def rollback_snapshot(spark: SparkSession, path: str, version: int) -> None:
    """Restore the table to ``version`` by removing every later snapshot
    (destructive restore — the simple-protocol equivalent of Delta's
    RESTORE; non-destructive restore = ``write_snapshot(read_snapshot(
    spark, path, version), path)``)."""
    versions = snapshot_versions(spark, path)
    if version not in versions:
        raise FileNotFoundError(f"snapshot v{version} not committed at {path}")
    fs, jvm = _hadoop_fs(spark, path)
    for v in versions:
        if v > version:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{_vdir(v)}"), True)


def vacuum_snapshots(spark: SparkSession, path: str, keep: int = 3) -> list[int]:
    """Delete all but the newest ``keep`` snapshots (storage reclamation;
    Delta's VACUUM). Returns the versions removed."""
    versions = snapshot_versions(spark, path)
    victims = versions[:-keep] if keep > 0 else versions
    fs, jvm = _hadoop_fs(spark, path)
    for v in victims:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{_vdir(v)}"), True)
    return victims


def diff_snapshots(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    v_old: int,
    v_new: int,
) -> DataFrame:
    """CDC-style diff between two snapshot versions of a table: one row
    per changed key with change_type in {inserted, deleted, updated}.
    'updated' means the key exists in both versions with any non-key
    column differing (md5 over the concatenated non-key columns — a
    column-order-stable row fingerprint, so schema-preserving rewrites
    with identical data diff empty).

    Scale: full-outer join keyed on the table key — the one shuffle a
    table diff fundamentally needs; fingerprints are computed scan-side
    so only (key, fp) pairs move."""
    from pyspark.sql import functions as F

    old = read_snapshot(spark, path, version=v_old)
    new = read_snapshot(spark, path, version=v_new)
    non_key = [c for c in old.columns if c not in key_cols]

    def fingerprinted(df, tag):
        return df.select(
            *key_cols,
            F.md5(
                F.concat_ws(
                    "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
                              for c in non_key]
                )
            ).alias(f"_fp_{tag}"),
        )

    joined = fingerprinted(old, "old").join(
        fingerprinted(new, "new"), key_cols, "full"
    )
    change = (
        F.when(F.col("_fp_old").isNull(), "inserted")
        .when(F.col("_fp_new").isNull(), "deleted")
        .when(F.col("_fp_old") != F.col("_fp_new"), "updated")
    )
    return (
        joined.select(*key_cols, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
