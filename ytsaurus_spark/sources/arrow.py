"""Arrow IPC files as a Spark Python DataSource (reader + writer).

The reference ships Arrow as a first-class I/O format (``EFormatType::
Arrow``, yt/yt/client/formats/public.h:49-62; writer/parser in
yt/yt/library/formats/arrow_writer.cpp, arrow_parser.cpp) — jobs can
consume and produce Arrow record-batch streams instead of row formats.

Spark re-expression: ``spark.read.format("ytarrow")`` /
``df.write.format("ytarrow")`` over Arrow IPC **files** (the feather2 /
random-access format: pa.ipc.new_file). Unlike the Skiff/Protobuf row
codecs, nothing here is per-row Python: the reader yields
``pyarrow.RecordBatch`` objects straight into Spark's Arrow lane, and the
writer receives Arrow batches from Spark — both directions stay columnar
end to end. One task per file on read, one file per partition on write;
files are self-describing (the IPC footer carries the schema), so no
sidecar is needed.

At scale this is the zero-copy interchange path: batches move
Arrow→Arrow with no transposition, so throughput is bounded by IO, and
a directory of IPC files parallelizes exactly like a parquet directory.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema
from pyspark.sql.types import StructType


class _ArrowFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _ipc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".arrow")
        )
    return [path]


class _ArrowReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self._path = path
        self._spark_schema = schema

    def partitions(self):
        files = _ipc_files(self._path)
        return [_ArrowFilePartition(f) for f in files] or [_ArrowFilePartition("")]

    def read(self, partition: _ArrowFilePartition):
        if not partition.path:
            return
        import pyarrow as pa

        target = to_arrow_schema(self._spark_schema)
        with pa.ipc.open_file(partition.path) as reader:
            for i in range(reader.num_record_batches):
                batch = reader.get_batch(i)
                # Column-prune + cast to the requested Spark schema so a
                # .schema(...) narrower than the file still works.
                cols = [
                    batch.column(batch.schema.get_field_index(f.name)).cast(f.type)
                    for f in target
                ]
                yield pa.RecordBatch.from_arrays(cols, schema=target)


class _ArrowCommit(WriterCommitMessage):
    pass


class _ArrowWriter(DataSourceArrowWriter):
    def __init__(self, path: str, schema: StructType):
        self._path = path
        self._schema = schema

    def write(self, iterator):
        import pyarrow as pa

        os.makedirs(self._path, exist_ok=True)
        out_path = os.path.join(self._path, f"part-{uuid.uuid4().hex}.arrow")
        target = to_arrow_schema(self._schema)
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    writer = pa.ipc.new_file(out_path, target)
                writer.write_batch(
                    pa.RecordBatch.from_arrays(
                        [c.cast(f.type) for c, f in zip(batch.columns, target)],
                        schema=target,
                    )
                )
            if writer is None:  # empty partition still writes a valid file
                writer = pa.ipc.new_file(out_path, target)
        finally:
            if writer is not None:
                writer.close()
        return _ArrowCommit()


class ArrowDataSource(DataSource):
    """``spark.read.format("ytarrow")`` / ``df.write.format("ytarrow")``."""

    @classmethod
    def name(cls) -> str:
        return "ytarrow"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("ytarrow datasource requires a path")
        return path

    def schema(self) -> StructType:
        import pyarrow as pa

        files = _ipc_files(self._path())
        if not files or not os.path.exists(files[0]):
            raise ValueError(
                f"no .arrow files under {self._path()}; pass .schema(...) explicitly"
            )
        with pa.ipc.open_file(files[0]) as reader:
            return from_arrow_schema(reader.schema)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ArrowReader(self._path(), schema)

    def writer(self, schema: StructType, overwrite: bool):
        import shutil

        path = self._path()
        if overwrite and os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        return _ArrowWriter(path, schema)


def register_arrow(spark: SparkSession) -> None:
    """Idempotently register the ytarrow format on a session."""
    try:
        spark.dataSource.register(ArrowDataSource)
    except Exception:  # already registered
        pass


def write_arrow(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    register_arrow(df.sparkSession)
    df.write.format("ytarrow").mode(mode).save(path)


def read_arrow(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    register_arrow(spark)
    reader = spark.read.format("ytarrow")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
