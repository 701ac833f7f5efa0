"""WebDataset-style tar-shard source/sink on Spark 4's Python DataSource
API (``pyspark.sql.datasource``).

Large training corpora — especially multimodal ones — ship as directories
of tar shards whose members are named ``<sample key>.<field ext>``
(WebDataset convention: ``000123.jpg``, ``000123.txt``, ``000123.json``
belong to one sample). This module makes those shards a first-class Spark
format in both directions:

- ``spark.read.format("webdataset").load("/corpus/shards")`` → one row
  per tar member: (shard, key, member, payload binary).
- ``df.write.format("webdataset").save("/out")`` → one tar shard per
  input partition (control shard count/size with the usual
  repartition-before-write), members written as ``key.member``.

Scale design:
- One INPUT PARTITION per shard: tars don't split (sequential headers),
  but shard directories are made of thousands of ~100MB-1GB files, so
  parallelism = shard count — exactly how WebDataset training jobs
  consume them. Member bytes stream through ``tarfile``'s sequential
  reader; nothing buffers a whole shard.
- The writer emits one shard per task and commits via per-task messages;
  a task retry overwrites its own shard file (names derive from the
  task-stable partition id Spark feeds the writer, not a RNG).

Everything is stdlib (``tarfile``, ``glob``) + the DataSource API — no
codecs, no external packages.
"""

from __future__ import annotations

import glob
import io
import os
import tarfile
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WDS_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("key", StringType()),
        StructField("member", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset member naming: everything up to the FIRST dot of the
    basename is the sample key, the rest is the field name
    (``000123.seg.png`` → key ``000123``, member ``seg.png``)."""
    base = os.path.basename(name)
    key, _, member = base.partition(".")
    return key, member


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WdsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset reader requires a path")
        pattern = path if path.endswith(".tar") else os.path.join(path, "*.tar")
        self._shards = sorted(glob.glob(pattern))

    def partitions(self) -> Sequence[InputPartition]:
        return [_ShardPartition(p) for p in self._shards]

    def read(self, partition: _ShardPartition) -> Iterator:
        """Yields Arrow RecordBatches (the DataSource API's fast path —
        row tuples would serialize one by one through Python pickling);
        batches of ~1000 members bound memory while amortizing the Arrow
        conversion."""
        import pyarrow as pa

        shard = os.path.basename(partition.path)
        cols: list[list] = [[], [], [], []]

        def flush():
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.binary()),
                ],
                names=["shard", "key", "member", "payload"],
            )

        with tarfile.open(partition.path, "r") as tf:
            for info in tf:
                if not info.isfile():
                    continue
                key, member = _split_key(info.name)
                buf = tf.extractfile(info)
                cols[0].append(shard)
                cols[1].append(key)
                cols[2].append(member)
                cols[3].append(buf.read() if buf else b"")
                if len(cols[0]) >= 1000:
                    yield flush()
                    cols = [[], [], [], []]
        if cols[0]:
            yield flush()


class _WdsCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class _WdsWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("webdataset writer requires a path")
        self._overwrite = overwrite

    def write(self, iterator: Iterator) -> _WdsCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self._dir, exist_ok=True)
        path = os.path.join(self._dir, f"shard-{pid:06d}.tar")
        # attempt-unique temp + rename: a task that dies mid-write leaves
        # only a .tmp-* file (swept at commit/abort), never a truncated
        # .tar a reader would pick up; the rename publishes atomically,
        # and concurrent speculative attempts can't clobber each other's
        # in-progress bytes.
        tmp = f"{path}.tmp-{ctx.taskAttemptId()}"
        n = 0
        try:
            with tarfile.open(tmp, "w") as tf:
                for row in iterator:
                    payload = (
                        bytes(row["payload"]) if row["payload"] is not None else b""
                    )
                    info = tarfile.TarInfo(name=f"{row['key']}.{row['member']}")
                    info.size = len(payload)
                    info.mtime = 0  # deterministic shard bytes
                    tf.addfile(info, io.BytesIO(payload))
                    n += 1
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return _WdsCommit(path, n)

    def _sweep_tmp(self) -> None:
        for leftover in glob.glob(os.path.join(self._dir, "*.tar.tmp-*")):
            os.remove(leftover)

    def commit(self, messages) -> None:
        # honor overwrite: a rewrite with fewer partitions must not leave
        # stale shard-NNNNNN.tar files for the reader to silently include
        committed = {m.path for m in messages if m is not None}
        if self._overwrite:
            for old in glob.glob(os.path.join(self._dir, "*.tar")):
                if old not in committed:
                    os.remove(old)
        self._sweep_tmp()

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        self._sweep_tmp()


class WebDatasetSource(DataSource):
    """``format("webdataset")`` — register once per session via
    ``spark.dataSource.register(WebDatasetSource)``."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> StructType:
        return WDS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WdsReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _WdsWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration of the webdataset format."""
    spark.dataSource.register(WebDatasetSource)
