"""Custom stateful streaming operators (SURVEY §2.6).

The reference's streaming state lives in consumer offsets + YT Flow operator
state; Spark's idiom is ``applyInPandasWithState`` (arbitrary per-key state
across micro-batches) and ``foreachBatch`` (exactly-once sinks via
idempotent batch writes keyed on epoch).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState


def running_counter(
    events: DataFrame,
    key_col: str,
    output_schema: str = None,  # type: ignore[assignment]
    state_schema: str = "n bigint, total double",
    value_col: str = "value",
):
    """Per-key running count+sum across micro-batches — the minimal custom
    stateful operator (YT Flow 'stateful map' analog). Returns the function
    + a ready-to-start grouped stream; caller picks the sink.

    Usage::

        out = events_stream.groupBy("user_id").applyInPandasWithState(
            fn, outputStructType, stateStructType, "append",
            GroupStateTimeout.NoTimeout)
    """
    output_schema = output_schema or f"{key_col} bigint, n bigint, total double"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return fn, output_schema, state_schema


def idempotent_batch_writer(write_fn) -> Any:
    """foreachBatch wrapper giving exactly-once semantics over an at-least-
    once stream: dedupe re-delivered epochs by id (the reference's producer
    sessions dedupe by sequence number the same way, producer_client.h)."""
    seen: set[int] = set()

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in seen:
            return
        seen.add(epoch_id)
        write_fn(batch_df, epoch_id)

    return _write
