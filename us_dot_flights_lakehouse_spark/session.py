"""SparkSession factory.

Re-derives the session semantics of the reference's ``configs/spark_config.py:28-61``
(AQE + partition coalescing + skew join + Kryo + Arrow + UTC) as a single
parameterized factory, without the Azure/Delta-catalog lock-in
(``configs/azure_config.py:88-116`` is cloud-specific and out of scope here;
object-store auth is the deployment layer's job, not the engine's).

Scale notes (100 TB):
- AQE is load-bearing: runtime partition coalescing and skew-join splitting
  are what keep 1000-executor shuffles healthy without hand-tuning.
- ``spark.sql.shuffle.partitions`` here is a *local-mode* default; on a real
  cluster leave it high (or rely on AQE coalescing) — AQE shrinks, it never
  grows beyond the initial number.
- Arrow must stay on: every Pandas-UDF operator (dedup, similarity, text)
  rides the Arrow batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session the engine creates.
ENGINE_CONFS: dict[str, str] = {
    # Catalyst runtime re-planning (reference: configs/spark_config.py:37-39)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow interchange for toPandas / pandas_udf (reference: spark_config.py:54-55)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps against external oracles (reference: azure_config.py:104-106)
    "spark.sql.session.timeZone": "UTC",
    # Spark 3.x / reference semantics: x/0 -> NULL, invalid casts -> NULL
    # (Spark 4 flipped the default to ANSI; the KPI-ratio NULL-on-zero
    # contract and permissive ingest of dirty feeds rely on legacy mode)
    "spark.sql.ansi.enabled": "false",
    # Kryo for shuffle/broadcast serde (reference: spark_config.py:40)
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # Small dims should broadcast aggressively (reference: build_fact_flights.py:113
    # raises it to 100MB for the fact build).
    "spark.sql.autoBroadcastJoinThreshold": str(100 * 1024 * 1024),
    # read TIMESTAMP(NANOS) parquet (unsupported natively) as long nanos;
    # sources.readers converts to microsecond timestamps, matching the
    # truncation external engines (DuckDB) apply on the same files
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # PySpark's per-op call-site capture (error-message enrichment only —
    # SPARK-47274) costs ~4 extra Py4J round-trips + a Python stack walk
    # on EVERY DataFrame method: profiled at ~20% of the catalog's warm
    # plan-construction time (r13). Purely diagnostic metadata; no effect
    # on plans or results.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "us_dot_flights_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so tests / bench share a consistent local parallelism. On a cluster,
    pass ``master=None`` with spark-submit providing the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(ENGINE_CONFS)
    if master.startswith("local"):
        # in local mode the driver JVM IS the executor; Spark's 1g default
        # starves broadcasts + storage long before the box does (found by
        # the 10x stress run: iterative broadcast joins died at 1g).
        # Only effective for the FIRST session of the process (JVM flag).
        confs.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
