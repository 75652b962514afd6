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

import json
import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
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


class ZombieEpochError(RuntimeError):
    """A fenced-out producer session tried to push (error code ZombieEpoch
    3102, yt/yt/client/queue_client/public.h:15): a newer ``create_session``
    for the same session id bumped the epoch, so this writer's pushes must
    be rejected to preserve exactly-once."""


class InvalidRowSequenceNumbersError(ValueError):
    """Sequence numbers inside one push batch must be strictly increasing
    (InvalidRowSequenceNumbers 3103, public.h:16)."""


class DurableQueue:
    """Ordered-table queue persisted as parquet segments under ``path``,
    with exactly-once producer sessions.

    Reference: producer sessions are identified by ``(session_id, epoch,
    sequence_number)`` (yt/yt/client/queue_client/public.h:38-40); a session
    is (re)created with ``CreateSession`` which returns the last acknowledged
    sequence number and a fresh epoch that fences zombie writers
    (producer_client.h:57-87). A push whose sequence numbers were already
    acknowledged is dropped silently — that replay-dedup is what makes
    retried pushes exactly-once.

    Spark re-expression: segments are append-only parquet directories named
    by the row-index range they cover; the atomic ``os.replace`` manifest
    (same protocol as sources/tx_table.py) carries the segment list, the
    next ``$row_index``, and per-session ``{epoch, last_seq}`` state. Reads
    union the manifested segments — a pull with a row-index range prunes to
    the overlapping segments via the manifest before any parquet IO, the
    same store-pruning a tablet pull does. At 100 TB the manifest stays tiny
    (one line per flush batch, compactable); row data never moves through
    the driver — only the pushed batch's DataFrame is written.
    """

    MANIFEST = "_queue.json"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest (atomic publish, tx_table.py protocol) ---------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, self.MANIFEST)

    def _state(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"segments": [], "next_row_index": 0, "sessions": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _publish(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._manifest_path)

    # -- producer sessions ---------------------------------------------

    def create_session(self, session_id: str) -> "ProducerSession":
        """CreateSession (producer_client.h:83-87): bump the session epoch
        (fencing any still-running writer with the old epoch) and return
        the last acknowledged sequence number so the producer can resume
        exactly where it stopped."""
        state = self._state()
        sess = state["sessions"].get(session_id, {"epoch": -1, "last_seq": -1})
        sess = {"epoch": sess["epoch"] + 1, "last_seq": sess["last_seq"]}
        state["sessions"][session_id] = sess
        self._publish(state)
        return ProducerSession(self, session_id, sess["epoch"], sess["last_seq"])

    # -- reads ----------------------------------------------------------

    def read(self, lo: int | None = None, hi: int | None = None) -> DataFrame:
        """Union of manifested segments; a [lo, hi) row-index range prunes
        non-overlapping segments from the manifest before any parquet IO."""
        segs = self._state()["segments"]
        if lo is not None:
            segs = [s for s in segs if s["hi"] >= lo]
        if hi is not None:
            segs = [s for s in segs if s["lo"] < hi]
        if not segs:
            return self.spark.createDataFrame([], schema="`$row_index` long")
        df = self.spark.read.parquet(*[os.path.join(self.path, s["dir"]) for s in segs])
        if lo is not None:
            df = df.filter(F.col("$row_index") >= lo)
        if hi is not None:
            df = df.filter(F.col("$row_index") < hi)
        return df


@dataclass
class ProducerSession:
    """One producer's exactly-once write session (IProducerSession,
    producer_client.h:57-75). ``push_batch`` returns the number of rows
    actually appended — a full replay returns 0."""

    queue: DurableQueue
    session_id: str
    epoch: int
    last_seq: int

    def push_batch(self, rows: DataFrame, seq_col: str | None = None,
                   commit_ts: float | None = None) -> int:
        """Append ``rows`` once, even if the same batch is pushed again.

        With ``seq_col`` the caller supplies explicit sequence numbers
        (strictly increasing within the batch); without it, numbers are
        auto-assigned (AutoSequenceNumber, producer_client.h:37) in the
        batch's current order. Rows whose sequence number is <= the last
        acknowledged one are dropped (the replay-dedup); a session whose
        epoch was superseded raises ZombieEpochError.

        ``commit_ts`` stamps the segment's commit instant (unix seconds;
        defaults to the wall clock) — the analog of a chunk's max commit
        timestamp, which queue static exports group by
        (queue_exporter.cpp GetMinExportUnixTs).

        The batch is one producer flush (BatchOptions, producer_client.h:
        22-28) — bounded, so the seq ordering window below runs over one
        flush's rows, not the queue; segment data is written distributed.
        """
        from pyspark.sql import Window as W

        state = self.queue._state()
        sess = state["sessions"].get(self.session_id)
        if sess is None or sess["epoch"] != self.epoch:
            raise ZombieEpochError(
                f"session {self.session_id!r} epoch {self.epoch} fenced "
                f"(current: {None if sess is None else sess['epoch']})"
            )
        if seq_col is None:
            seq_col = "$sequence_number"
            w = W.orderBy(F.monotonically_increasing_id())
            rows = rows.withColumn(
                seq_col,
                F.row_number().over(w).cast("long") + self.last_seq,
            )
            stats = rows.agg(
                F.count("*").alias("n"), F.max(seq_col).alias("hi_seq")
            ).first()
        else:
            # One aggregate job answers all three pre-write questions
            # (batch size, duplicate check, fresh count/high-water) —
            # formerly count() + distinct().count() + a fresh agg, each
            # of which re-executed the caller's (possibly expensive,
            # lazily-built) batch plan end to end. NULL sequence numbers
            # count as one distinct value, exactly like the old
            # distinct().count(); fresh excludes them, exactly like the
            # old `seq > last_seq` filter.
            rows = rows.withColumn(seq_col, F.col(seq_col).cast("long"))
            is_fresh = F.col(seq_col) > self.last_seq
            st = rows.agg(
                F.count("*").alias("n_all"),
                F.count_distinct(F.col(seq_col)).alias("n_distinct"),
                F.max(F.col(seq_col).isNull().cast("int")).alias("has_null"),
                F.count(F.when(is_fresh, 1)).alias("n"),
                F.max(F.when(is_fresh, F.col(seq_col))).alias("hi_seq"),
            ).first()
            if int(st["n_distinct"]) + int(st["has_null"] or 0) != int(st["n_all"]):
                raise InvalidRowSequenceNumbersError(
                    "duplicate sequence numbers within one push batch"
                )
            stats = st
        fresh = rows.filter(F.col(seq_col) > self.last_seq)
        idx = W.orderBy(seq_col)
        fresh = fresh.withColumn(
            "$row_index",
            F.row_number().over(idx).cast("long") + state["next_row_index"] - 1,
        )
        n = int(stats["n"])
        if n == 0:
            return 0
        lo = state["next_row_index"]
        hi = lo + n - 1
        seg_dir = f"seg_{lo}_{hi}"
        fresh.write.mode("overwrite").parquet(os.path.join(self.queue.path, seg_dir))
        # Re-check the fence AFTER the (slow) write, right before publish:
        # a writer fenced mid-write must not land its manifest entry.
        latest = self.queue._state()
        cur = latest["sessions"].get(self.session_id)
        if cur is None or cur["epoch"] != self.epoch:
            raise ZombieEpochError(
                f"session {self.session_id!r} fenced during push"
            )
        import time as _time

        latest["segments"].append({
            "dir": seg_dir, "lo": lo, "hi": hi,
            "ts": float(commit_ts if commit_ts is not None else _time.time()),
        })
        latest["next_row_index"] = hi + 1
        self.last_seq = int(stats["hi_seq"])
        latest["sessions"][self.session_id] = {
            "epoch": self.epoch,
            "last_seq": self.last_seq,
        }
        self.queue._publish(latest)
        return n


def with_row_index(df: DataFrame, order_by: list[str]) -> DataFrame:
    """Materialize a ``$row_index``-style column for a table that lacks one.

    Uses a global row_number window — acceptable for bounded snapshots;
    production ordered tables should persist the index at write time
    (the reference assigns it on commit, ordered_dynamic_store.cpp:288)."""
    from pyspark.sql import Window as W

    w = W.orderBy(*order_by)
    return df.withColumn("$row_index", F.row_number().over(w).cast("long") - 1)


def publish_changes(
    table,
    queue: DurableQueue,
    session_id: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> int:
    """Ship a LogTxTable's net row-image diff into a DurableQueue — the
    reference's replication-log/changelog delivery: row change records
    flow to consumers through an ordered queue, and the producer-session
    replay dedup makes redelivery exactly-once (a retried publish of the
    same version range appends nothing).

    Sequence numbers are DETERMINISTIC: ``to_version * 2^32 + rank``
    where rank orders the diff by its key columns — so the same diff
    always carries the same numbers (that is what the session's
    replay-dedup keys on), and diffs of later version ranges always sort
    after earlier ones. Returns the number of records actually appended.

    Consumer side: ``pull_queue``/``pull_and_advance`` deliver the change
    records in order; ``LogTxTable.apply_changes`` applies them (the
    other half of the CDC pair, sources/tx_table.py).

    Scale note: rank assignment is a single-partition window over the
    DIFF (not the table) — the same one-flush bound as push_batch's
    auto-sequencing; a publish is one producer flush by contract. For
    diffs beyond one flush, publish per key range (each range is its own
    deterministic record block).
    """
    from pyspark.sql import Window as W

    v2 = (
        to_version
        if to_version is not None
        else table.current_version()
    )
    diff = table.changes_between(
        from_version=from_version, to_version=v2
    )
    w = W.orderBy(*[F.col(c) for c in table.key_cols])
    records = diff.withColumn(
        "$sequence_number",
        (F.lit(int(v2) * (1 << 32)) + F.row_number().over(w)).cast("long"),
    )
    # O(changes) rows by the one-flush contract; materialize once so the
    # session's pre-write aggregate and the segment write don't each
    # re-derive the diff (two resolved lookups + a full-outer join).
    records = records.localCheckpoint()
    session = queue.create_session(session_id)
    return session.push_batch(records, seq_col="$sequence_number")
