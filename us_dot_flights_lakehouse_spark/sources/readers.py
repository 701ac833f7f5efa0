"""Batch sources (SURVEY.md §2.1 S1-S4, S10).

The reference reads monthly CSV drops and Delta tables
(``spark_jobs/bronze_ingest/download_and_ingest.py:54-58``,
``flights_silver_transform.py:190``). Locally the engine reads the driver
parquet testdata; on a cluster the same helpers take any hadoop-visible
path (s3a://, abfss://, hdfs://) — object-store auth is session conf,
not reader logic.

Scale notes (100 TB):
- Parquet scans get predicate pushdown + column pruning from Catalyst for
  free *if* callers express filters/selects on the returned DataFrame —
  readers here never force materialization.
- ``inferSchema`` CSV reads (S1) require an extra pass over the data; at
  scale always pass an explicit schema (S2) — infer is only for drifted
  ad-hoc drops, mirroring the reference's drift-reconciliation use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Every table the local test harness knows about (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: event-time columns whose physical parquet type has varied across
#: testdata generations: TIMESTAMP(NANOS) (read as long nanos under the
#: nanosAsLong conf) or TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
#: TIMESTAMP_NTZ). Both are normalized to plain TIMESTAMP so downstream
#: event-time operators (withWatermark, stream-stream joins — which
#: reject NTZ) see one type regardless of the file's vintage.
NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def normalize_nano_ts(df: DataFrame, table: str) -> DataFrame:
    """Normalize event-time columns to microsecond TIMESTAMP:

    - long nanos (nanosAsLong reads) → floor-divide to µs, the same
      truncation DuckDB applies reading the same file;
    - TIMESTAMP_NTZ (µs-without-timezone parquet) → cast to TIMESTAMP.
      The cast interprets the wall time in the session timezone and
      rendering inverts it, so collected values equal the stored wall
      time under any session tz — matching what a SQL oracle reading
      the naive column sees."""
    for c in NANO_TS_COLS.get(table, ()):
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


#: (path, mtime_ns, size) → StructType. Footer/schema inference costs
#: ~0.1s of driver time PER spark.read.parquet call (measured: 0.113s →
#: 0.022s with an explicit schema) and the catalog issues hundreds of
#: them per bench pass (r13, guide §7.3 planning cost). The memo holds
#: pure schema metadata — never rows, never plans — and the stat stamp
#: invalidates it the moment a table file/directory is rewritten, so
#: every invocation still computes from the parquet inputs.
_SCHEMA_MEMO: dict = {}


def _table_schema(spark: SparkSession, path: str) -> T.StructType:
    import os

    try:
        st = os.stat(path)
        stamp: tuple | None = (st.st_mtime_ns, st.st_size)
        # directory tables: the directory's own mtime only changes on
        # create/delete/rename of an entry, NOT when a contained part-file
        # is rewritten in place — fold the children's max (mtime_ns, size)
        # into the stamp so an in-place rewrite re-infers (r13 verdict
        # 'What's wrong' #3). One shallow listdir per read_table call;
        # parquet part files live flat under the table directory.
        if os.path.isdir(path):
            kids = []
            with os.scandir(path) as it:
                for e in it:
                    try:
                        kst = e.stat()
                    except OSError:
                        continue
                    kids.append((kst.st_mtime_ns, kst.st_size))
            stamp = (st.st_mtime_ns, st.st_size, max(kids, default=(0, 0)), len(kids))
    except OSError:
        stamp = None
    key = (path, stamp)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_MEMO[key] = sch
    return sch


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S4: columnar table scan (reference loads Delta; locally parquet).

    Self-sufficient under ANY caller session: the testdata's ``events``
    table stores TIMESTAMP(NANOS), which Spark rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. The conf is
    runtime-settable, so set it here rather than relying on the engine's
    own session factory having built the session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    return normalize_nano_ts(
        spark.read.schema(_table_schema(spark, path)).parquet(path), name
    )


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming sibling of ``read_table``: a file-stream over a driver
    table in EITHER physical shape.

    - Directory of part files (the production table shape): stream the
      table path directly. A leaf-filename glob would match nothing
      here — the r12 split-input invariance sweep caught exactly that
      (st_running_totals/st_stream_dedup read 0 rows on multi-file
      tables).
    - Single parquet file (this repo's testdata shape): the file-stream
      source requires a directory basePath, so stream the PARENT with a
      ``pathGlobFilter`` pinned to the one file.

    The shape probe is a local filesystem check; on an object store a
    table is always the directory shape, i.e. the first branch."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    schema = _table_schema(spark, path)
    if os.path.isdir(path):
        raw = spark.readStream.schema(schema).parquet(path)
    else:
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    return normalize_nano_ts(raw, name)


#: (path, stat stamp, defaultParallelism) → scan partition count. Pure
#: scan METADATA (an integer derived from file layout + split size —
#: never rows or results), invalidated by the same stat stamp as the
#: schema memo. Probing costs one physical-planning pass per call and
#: read_corpus has ~100 callers per bench pass, hence the memo.
_SCAN_PARTS_MEMO: dict = {}


def scan_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s planned scan, probed from the RDD
    lineage without running a job. Call only on scan+project shapes
    (no exchanges), where building the RDD is pure planning. Returns 0
    when the probe fails — callers treat that as 'narrow' and keep
    their repartition (the conservative local default)."""
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return 0


def _scan_parts(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Memoized ``scan_partitions`` for a table at ``path``: the split
    count depends on file layout + session split confs, not on the
    projection, so one probe per (path, stat stamp, parallelism) serves
    every projected consumer. The probe itself costs ~50 ms of physical
    planning (measured), which matters ×(call sites × bench reps)."""
    import os

    par = spark.sparkContext.defaultParallelism
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    key = (path, stamp, par)
    n = _SCAN_PARTS_MEMO.get(key)
    if n is None:
        n = scan_partitions(df)
        _SCAN_PARTS_MEMO[key] = n
    return n


def spread_scan(df: DataFrame, *part_cols, table_path: str | None = None) -> DataFrame:
    """Key-hash repartition for heavy partial-aggregate/kernel work, but
    ONLY when the scan arrives narrower than the session's parallelism
    (the single-row-group local-file artifact, guide §2.5 input skew).

    At the 100 TB regime the scan already yields ≥ parallelism splits, so
    partial aggregation runs map-side and an unconditional repartition
    would be a full-data exchange — the 'shuffle fewer bytes'
    anti-pattern (ADVICE r13). The gate keeps the local fix and removes
    the at-scale cost; results are partition-layout invariant for every
    caller (all are order-insensitive aggregates, pinned by the clone
    sweeps). ``table_path`` (when the caller scans one table) lets the
    probe hit the per-table memo instead of re-planning."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if table_path is not None:
        n = _scan_parts(spark, table_path, df)
    else:
        n = scan_partitions(df)
    if n >= par:
        return df
    return df.repartition(par, *part_cols)


def read_corpus(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan for CPU-heavy per-row work (shingling, hashing, Arrow kernels):
    read_table + repartition to the session's core count — WHEN the scan
    arrives narrower than the core count.

    Why: a small single-row-group parquet file arrives as ONE input split,
    serializing downstream regex/hash/numpy work on one core — measured 3×+
    on the dedup family locally. The repartition shuffles only the raw
    corpus bytes (trivial next to the per-row compute it unlocks). On a
    real cluster a 100 TB corpus already arrives in thousands of splits —
    there the repartition would shuffle the whole corpus for nothing
    (guide §2.3), so it is gated on the probed scan parallelism (r14;
    same posture as ``spread_scan``). Callers doing plain columnar
    scans/aggs should keep using read_table, where an extra exchange
    measurably loses (simple aggs are faster single-pass)."""
    df = read_table(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if _scan_parts(spark, f"{sf_dir}/{name}.parquet", df) >= par:
        return df
    return df.repartition(par)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
    timestamp_format: str | None = None,
) -> DataFrame:
    """S1/S2: CSV scan, inferred (reference download_and_ingest.py:54-58) or
    schema-enforced (notebook cell 1)."""
    reader = spark.read.option("header", "true")
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        return reader.schema(schema).csv(path)
    if infer:
        return reader.option("inferSchema", "true").csv(path)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines scan with a MANDATORY schema — the standard interchange
    format for text-corpus pipelines. Schema inference on JSON is a full
    extra pass over the data (ruinous at 100 TB), so it is not offered;
    pass the contract schema and let malformed rows surface as nulls
    (Spark's default PERMISSIVE mode). Uncompressed/zstd JSONL is
    line-splittable, so Spark parallelizes within large files; gzip is
    not — one task per .gz file regardless of size."""
    return spark.read.schema(schema).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC columnar scan (built-in native reader). Same pushdown contract
    as parquet: filters and column pruning reach the stripe reader."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def reconcile_schema(
    df: DataFrame,
    target: T.StructType,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Schema-drift reconciliation (reference download_and_ingest.py:61-78
    renames OP_CARRIER_AIRLINE_ID→OP_UNIQUE_CARRIER and conditionally casts
    FL_DATE string→timestamp; Autoloader's addNewColumns evolution at :220):

    - apply known legacy-name ``renames``;
    - cast columns whose type drifted to the target type (legacy
      permissive-cast semantics: unparseable values become NULL);
    - add target columns missing from the feed as typed NULLs;
    - project to exactly the target columns, in target order (extra feed
      columns drop — the write-side ``mergeSchema`` path is for keeping
      them instead).
    """
    for old, new in (renames or {}).items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    have = dict(df.dtypes)
    cols = []
    for field in target.fields:
        if field.name not in have:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif have[field.name] != field.dataType.simpleString():
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def evolved_read(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a table whose files were written under EVOLVING schemas,
    unioning all versions' columns (reference relies on Delta
    ``mergeSchema``/``overwriteSchema``; plain parquet gets the same via
    the mergeSchema scan option — schema reconciliation happens at file
    granularity, older files surface NULLs for newer columns)."""
    return spark.read.option("mergeSchema", "true").format(fmt).load(path)


def lookup_scan(
    df: DataFrame,
    code_col: str,
    desc_col: str,
    code_alias: str = "Code",
    desc_alias: str = "Description",
) -> DataFrame:
    """S3: lookup projection — trim + alias the (code, description) pair
    (reference download_and_ingest.py:83-97). Caller broadcasts on join."""
    return df.select(
        F.trim(F.col(code_col).cast("string")).alias(code_alias),
        F.trim(F.col(desc_col).cast("string")).alias(desc_alias),
    )


def with_lineage(df: DataFrame, partition_date_col: str | None = None) -> DataFrame:
    """S10: audit columns — source file + ingestion timestamp
    (reference download_and_ingest.py:104-110,195-197)."""
    out = df.withColumn("source_file", F.input_file_name()).withColumn(
        "ingestion_timestamp", F.current_timestamp()
    )
    if partition_date_col is not None:
        out = out.withColumn("partition_date", F.to_date(F.col(partition_date_col)))
    return out


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
):
    """Corrupt-tolerant CSV scan: PERMISSIVE mode parses what it can and
    captures the raw text of every malformed line in ``corrupt_col``
    instead of failing the 100 TB job on row 3 billion (DROPMALFORMED
    silently loses data; FAILFAST dies). Returns (valid_df, corrupt_df) —
    route ``corrupt_df`` to a quarantine sink and gate on its count.
    """
    full = (
        spark.read.schema(f"{schema}, {corrupt_col} string")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
        .cache()
    )
    valid = full.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    corrupt = full.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return valid, corrupt
