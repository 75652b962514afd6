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


def time_order_recover(
    key_col: str,
    ts_col: str = "ts",
    delay_us: int = 60_000_000,
    payload_cols: tuple = ("event_id", "value"),
    output_schema: str | None = None,
):
    """Out-of-order recovery: re-emit each key's events in EVENT-TIME order,
    holding back anything younger than ``delay_us`` behind the key's
    max-seen timestamp — the reference's TimeOrderRecover node
    (yql/essentials/minikql/comp_nodes/mkql_time_order_recover.cpp), which
    YQL inserts before order-sensitive streaming ops; Spark's watermark
    covers the *dropping* side, this covers the *reordering* side.

    Returns (fn, output_schema, state_schema) for
    ``grouped.applyInPandasWithState(fn, out, state, "append", NoTimeout)``.
    State per key = the buffered (ts, payload...) rows still inside the
    delay window — bounded by delay × event rate, the same bound the
    reference's heap carries. Emitted rows get ``emit_seq`` (0-based per
    key) so downstream operators can assert monotone event time.
    """
    out = output_schema or (
        f"{key_col} bigint, {ts_col} bigint, "
        + ", ".join(f"{c} double" if c == "value" else f"{c} bigint" for c in payload_cols)
        + ", emit_seq bigint"
    )
    buf_cols = [ts_col, *payload_cols]
    state_schema = "buf string, emitted bigint"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import json

        if state.exists:
            buf_json, emitted = state.get
            buf = json.loads(buf_json)
        else:
            buf, emitted = [], 0
        for pdf in pdfs:
            if len(pdf):
                # to_json round-trip yields native Python scalars (numpy
                # types are not JSON-serializable for the state column);
                # double_precision=15 keeps double payloads exact — the
                # default 10 silently truncates them
                buf.extend(
                    json.loads(
                        pdf[buf_cols].to_json(
                            orient="values", double_precision=15
                        )
                    )
                )
        if not buf:
            return
        max_ts = max(r[0] for r in buf)
        horizon = max_ts - delay_us
        # tie-break equal timestamps on the first payload column so the
        # emitted order is fully deterministic
        ready = sorted((r for r in buf if r[0] <= horizon), key=lambda r: (r[0], r[1]))
        buf = [r for r in buf if r[0] > horizon]
        state.update((json.dumps(buf), emitted + len(ready)))
        if ready:
            out_pdf = pd.DataFrame(ready, columns=buf_cols)
            out_pdf.insert(0, key_col, key[0])
            out_pdf["emit_seq"] = range(emitted, emitted + len(ready))
            yield out_pdf

    return fn, out, state_schema


def cusum_monitor(
    key_col: str,
    order_col: str = "event_id",
    val_col: str = "cents",
    reference: int = 10_500,
    threshold: int = 100_000,
):
    """One-sided streaming CUSUM drift monitor (Page 1954): per key,
    fold ``s = max(0, s + (x − reference))`` in ``order_col`` order and
    flag ``alarm = s > threshold`` — the canonical change-detection
    monitor over a metric stream, with per-key integer state carried
    across micro-batches. All arithmetic is exact Python/BIGINT integers
    (feed cents-scaled values), so the streamed fold is bit-identical to
    the batch reset identity ``s_t = cum_t − least(0, min_{i≤t} cum_i)``
    — which is exactly what the DuckDB oracle computes with two window
    passes.

    Feed in-order streams (or compose with ``time_order_recover``
    upstream for out-of-order feeds); within a batch the fn sorts by
    ``order_col``, across batches state continues the fold. State per
    key = two BIGINTs — O(keys), the smallest possible monitor state.

    Returns (fn, output_schema, state_schema) for
    ``grouped.applyInPandasWithState(fn, out, state, "append", NoTimeout)``.
    """
    out = (
        f"{key_col} string, {order_col} bigint, {val_col} bigint, "
        "s bigint, alarm boolean"
    )
    state_schema = "s bigint, n bigint"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        s, n = state.get if state.exists else (0, 0)
        rows = []
        for pdf in pdfs:
            if len(pdf):
                rows.extend(
                    (int(o), int(x))
                    for o, x in zip(pdf[order_col], pdf[val_col])
                )
        if not rows:
            return
        rows.sort()
        out_rows = []
        for o, x in rows:
            s = s + (x - reference)
            if s < 0:
                s = 0
            n += 1
            out_rows.append((key[0], o, x, s, s > threshold))
        state.update((s, n))
        yield pd.DataFrame(
            out_rows, columns=[key_col, order_col, val_col, "s", "alarm"]
        )

    return fn, out, state_schema


# NOTE: Spark 4's transformWithStateInPandas (StatefulProcessor + typed
# ValueState handles) is the designated successor of applyInPandasWithState
# for the custom stateful operators in this module. It is NOT used here
# because its driver worker imports google.protobuf, which this
# environment does not provide (verified: STREAMING_PYTHON_RUNNER_
# INITIALIZATION_FAILURE / ImportError google.protobuf.descriptor) — the
# applyInPandasWithState implementations above are the supported path.
