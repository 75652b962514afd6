"""Flow pipelines: persistent source → chained transforms → persistent sink.

Reference: YT Flow (yt/yt/flow/lib/, yql/providers/ytflow/) structures
streaming computations as ``YtflowPersistentSource → YtflowMap... →
YtflowPersistentSink`` graphs (yql_ytflow_expr_nodes.json). The same
pipeline description here runs in either mode:

- ``run_batch()``   — one-shot materialization (bootstrap / backfill);
- ``run_stream()``  — Structured Streaming with checkpointed exactly-once
  progress (the persistent-operator semantics: restart resumes from the
  checkpoint, not from scratch).

Transforms are DataFrame→DataFrame functions, so every stage stays
declarative and Catalyst plans the fused graph — a YtflowMap chain compiles
to one Spark plan, not N materializations.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class FlowPipeline:
    spark: SparkSession
    source_path: str
    source_schema: object
    sink_path: str
    checkpoint_path: str
    transforms: list[Transform] = field(default_factory=list)
    source_format: str = "parquet"
    sink_format: str = "parquet"
    source_options: dict = field(default_factory=dict)

    def map(self, fn: Transform) -> "FlowPipeline":
        self.transforms.append(fn)
        return self

    def _apply(self, df: DataFrame) -> DataFrame:
        for fn in self.transforms:
            df = fn(df)
        return df

    def run_batch(self) -> int:
        """One-shot run; returns rows written."""
        src = self.spark.read.schema(self.source_schema).options(
            **self.source_options
        ).format(self.source_format).load(self.source_path)
        out = self._apply(src)
        out.write.mode("overwrite").format(self.sink_format).save(self.sink_path)
        return self.spark.read.format(self.sink_format).load(self.sink_path).count()

    def run_stream(self, await_all: bool = True):
        """Streaming run with checkpointed progress: re-running after a stop
        processes only files not yet committed to the checkpoint — the
        persistent-operator restart semantics of YT Flow."""
        src = self.spark.readStream.schema(self.source_schema).options(
            **self.source_options
        ).format(self.source_format).load(self.source_path)
        out = self._apply(src)
        q = (
            out.writeStream.format(self.sink_format)
            .option("checkpointLocation", self.checkpoint_path)
            .option("path", self.sink_path)
            .outputMode("append")
            .start()
        )
        if await_all:
            q.processAllAvailable()
            q.stop()
        return q
