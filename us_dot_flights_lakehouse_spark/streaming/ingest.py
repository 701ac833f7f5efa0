"""Incremental file-stream ingest (SURVEY.md §2.8 ST1/ST2, §2.1 S7/S8).

Re-derives the reference's Databricks-Autoloader bronze ingest
(``download_and_ingest.py:214-248``: cloudFiles CSV stream, schema
evolution, checkpointed append, trigger-once) on open-source Spark's
file-listing stream source: same exactly-once semantics (checkpointed
file tracking), same run-once operational model (``availableNow``),
no Databricks dependency.

Scale notes (100 TB):
- The file-listing source checkpoints processed-file names; with
  ``maxFilesPerTrigger`` each micro-batch is bounded, so a backlog of
  months of drops ingests incrementally instead of as one giant batch.
- ``availableNow`` (vs ``once``) drains the backlog across *multiple*
  rate-limited batches — the correct run-once trigger at scale.
- Appends partitioned by ingest date: no overwrite of history, and
  downstream readers prune by partition (the reference's
  overwrite-everything mode is the anti-pattern we drop).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_file_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    dest_dir: str,
    checkpoint_dir: str,
    source_format: str = "csv",
    dest_format: str = "parquet",
    partition_date_col: str | None = None,
    max_files_per_trigger: int | None = None,
    header: bool = True,
) -> StreamingQuery:
    """ST1+ST2: checkpointed incremental ingest of a landing directory.

    Returns the started query; call ``.awaitTermination()`` — with the
    default availableNow trigger it drains everything currently in
    ``source_dir`` and stops. Re-running picks up only NEW files
    (exactly-once via the checkpoint), replacing Autoloader's
    ``includeExistingFiles``/file-notification machinery.
    """
    reader = spark.readStream.schema(schema)
    if source_format == "csv":
        reader = reader.option("header", str(header).lower())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.format(source_format).load(source_dir)

    # lineage/audit columns (reference download_and_ingest.py:236-238)
    df = df.withColumn("source_file", F.input_file_name()).withColumn(
        "ingestion_timestamp", F.current_timestamp()
    )
    partition_by = []
    if partition_date_col is not None:
        df = df.withColumn("partition_date", F.to_date(F.col(partition_date_col)))
        partition_by = ["partition_date"]

    writer = (
        df.writeStream.format(dest_format)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start(dest_dir)


def evolve_stream_schema(
    spark: SparkSession,
    source_dir: str,
    schema_log_dir: str,
    source_format: str = "csv",
    header: bool = True,
    base_schema: T.StructType | None = None,
    max_sample_files: int = 100,
) -> T.StructType:
    """Autoloader ``schemaEvolutionMode=addNewColumns`` re-derived
    (reference download_and_ingest.py:220): infer the schema of the
    files currently in the landing dir, merge it with the versioned
    schema log — existing columns keep their logged type and ORDER, and
    genuinely new columns APPEND (so CSV position mapping keeps working
    for older, narrower files: their missing trailing columns read as
    null under PERMISSIVE mode) — then persist a new log version when
    the schema grew.

    Scale: inference samples at most ``max_sample_files`` of the newest
    files (Autoloader samples the same way) — a months-deep landing
    zone is never fully rescanned. The schema log is tiny JSON on the
    driver-visible checkpoint volume, one file per version, exactly the
    shape of Autoloader's ``_schemas`` log."""
    import json
    import os

    os.makedirs(schema_log_dir, exist_ok=True)
    versions = sorted(
        f for f in os.listdir(schema_log_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    logged: T.StructType | None = base_schema
    if versions:
        with open(os.path.join(schema_log_dir, versions[-1])) as fh:
            logged = T.StructType.fromJson(json.load(fh))

    # bounded inference over the newest files only
    listing = sorted(
        (os.path.getmtime(os.path.join(source_dir, f)), os.path.join(source_dir, f))
        for f in os.listdir(source_dir)
        if not f.startswith(("_", "."))
    )[-max_sample_files:]
    sample_paths = [p for _, p in listing]
    if not sample_paths and logged is not None:
        return logged
    reader = spark.read.format(source_format)
    if source_format == "csv":
        reader = reader.option("header", str(header).lower()).option(
            "inferSchema", "true"
        )
    inferred = reader.load(sample_paths).schema

    if logged is None:
        merged = inferred
    else:
        known = {f.name for f in logged.fields}
        merged = T.StructType(
            list(logged.fields)
            + [f for f in inferred.fields if f.name not in known]
        )
    if logged is None or [f.name for f in merged.fields] != [
        f.name for f in logged.fields
    ]:
        next_v = len(versions)
        with open(os.path.join(schema_log_dir, f"v{next_v:04d}.json"), "w") as fh:
            json.dump(merged.jsonValue(), fh)
    return merged


def stream_file_ingest_evolving(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    schema_log_dir: str,
    source_format: str = "csv",
    base_schema: T.StructType | None = None,
    **kwargs,
) -> tuple[StreamingQuery, T.StructType]:
    """ST1+ST2 with addNewColumns schema evolution: resolve the current
    union schema against the schema log, then run the checkpointed
    ingest with it. A monthly feed that grows a column lands with the
    wide schema from that run onward; earlier sink files stay narrow —
    read the sink with ``mergeSchema`` (parquet) and the old rows are
    null-backfilled, which is exactly Autoloader's contract. The file
    checkpoint is untouched by evolution: re-runs still pick up only
    NEW files. Returns ``(query, schema_used)``."""
    schema = evolve_stream_schema(
        spark,
        source_dir,
        schema_log_dir,
        source_format=source_format,
        base_schema=base_schema,
    )
    q = stream_file_ingest(
        spark,
        source_dir,
        schema,
        dest_dir,
        checkpoint_dir,
        source_format=source_format,
        **kwargs,
    )
    return q, schema
