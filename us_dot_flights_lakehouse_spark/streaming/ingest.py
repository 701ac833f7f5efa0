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
