"""Queue / consumer-offset semantics on ordered tables (SURVEY §2.6).

Reference: queues are ordered dynamic tables with system columns
``$tablet_index``/``$row_index``; consumers advance named offsets via
``PullQueue`` / ``PullQueueConsumer`` / ``AdvanceConsumer``
(yt/yt/client/api/queue_client.h:115-143, consumer state in
yt/yt/client/queue_client/consumer_client.h).

Spark re-expression: an ordered table is any DataFrame with a monotonically
increasing row-index column (``event_id`` in the fixtures ≈ ``$row_index``).
A consumer is a tiny offset record; ``pull`` reads ``[offset, offset+n)`` as
a pushed-down range filter (partition-prunable at scale when the table is
range-partitioned on the index — exactly how tablets bound a pull to one
store). Real incremental pipelines use Structured Streaming (see
streaming_q.py); this class covers the reference's *explicit-offset* API
which is replay-from-anywhere by design.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class QueueConsumer:
    """Named consumer with per-partition offsets (partition_index ≈
    $tablet_index; single-partition queues use partition 0)."""

    name: str
    offsets: dict[int, int] = field(default_factory=dict)

    def offset(self, partition: int = 0) -> int:
        return self.offsets.get(partition, 0)

    def advance(self, new_offset: int, partition: int = 0) -> None:
        # AdvanceConsumer semantics: monotonic, idempotent re-advance allowed
        # (queue_client.h:136-143).
        if new_offset < self.offset(partition):
            raise ValueError(
                f"consumer {self.name}: offset moves backwards "
                f"({self.offset(partition)} -> {new_offset})"
            )
        self.offsets[partition] = new_offset


def pull_queue(
    queue: DataFrame,
    row_index_col: str,
    offset: int,
    max_rows: int,
    partition_col: str | None = None,
    partition: int = 0,
) -> DataFrame:
    """PullQueue: rows with index in [offset, offset + max_rows).

    The range predicate pushes down to the scan (parquet min/max pruning),
    so a pull touches only the row groups covering the range — the same
    store-pruning the reference's tablet readers do."""
    df = queue
    if partition_col is not None:
        df = df.filter(F.col(partition_col) == partition)
    return df.filter(
        (F.col(row_index_col) >= offset) & (F.col(row_index_col) < offset + max_rows)
    )


def pull_and_advance(
    queue: DataFrame,
    consumer: QueueConsumer,
    row_index_col: str,
    max_rows: int,
    partition_col: str | None = None,
    partition: int = 0,
) -> DataFrame:
    """PullQueueConsumer + AdvanceConsumer in one step (at-least-once:
    advance only after the batch is durably processed in real use).

    The consumer advances to ``max(row_index) + 1`` of the rows actually
    returned — NOT ``start + max_rows`` — so a short pull (fewer rows than
    requested) never skips indexes that a later producer may still fill;
    the reference's AdvanceConsumer derives the new offset from rows read
    (queue_client.h:136-143). On a multi-partition queue, ``partition_col``
    scopes both the pull and the offset to one partition ($tablet_index)."""
    start = consumer.offset(partition)
    batch = pull_queue(
        queue,
        row_index_col,
        start,
        max_rows,
        partition_col=partition_col,
        partition=partition,
    )
    hi = batch.agg(F.max(row_index_col).alias("hi")).first()["hi"]
    if hi is not None:
        consumer.advance(int(hi) + 1, partition)
    return batch


def trim_queue(
    queue: DataFrame,
    row_index_col: str,
    trim_up_to: int,
    partition_col: str | None = None,
    partition: int = 0,
) -> DataFrame:
    """TrimTable analog: drop rows with index < ``trim_up_to`` (rows every
    registered consumer has passed). With a partition column, only that
    partition trims — other tablets keep their rows."""
    below = F.col(row_index_col) < trim_up_to
    if partition_col is not None:
        below = below & (F.col(partition_col) == partition)
    return queue.filter(~below)


def with_row_index(df: DataFrame, order_by: list[str]) -> DataFrame:
    """Materialize a ``$row_index``-style column for a table that lacks one.

    Uses a global row_number window — acceptable for bounded snapshots;
    production ordered tables should persist the index at write time
    (the reference assigns it on commit, ordered_dynamic_store.cpp:288)."""
    from pyspark.sql import Window as W

    w = W.orderBy(*order_by)
    return df.withColumn("$row_index", F.row_number().over(w).cast("long") - 1)
