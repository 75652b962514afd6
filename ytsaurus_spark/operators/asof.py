"""As-of / range join — a training-pipeline staple Spark lacks natively.

Implemented as a composition of built-in ops (no UDF): tag both sides, union
on the shared sort axis, carry the most recent right-side row forward with a
``last(ignorenulls)`` window, keep left rows. One shuffle (the window's
partitionBy), fully codegen'd — scales like any window aggregate and avoids
the per-group ``pd.merge_asof`` Python path entirely.

Every direction uses an UNBOUNDED PRECEDING frame: forward is expressed as
backward over a DESCENDING axis sort, because Spark evaluates
``unboundedPreceding..0`` frames incrementally (O(n) per partition) while
``0..unboundedFollowing`` frames re-aggregate from each row to partition end
(O(n²) on a hot key — a non-starter for a million-event key).

DuckDB's native ASOF JOIN serves as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _carry_window(by: list[str], on: str, *, fwd: bool, strict: bool):
    """The carry window for one direction, always with an incremental
    UNBOUNDED PRECEDING frame.

    Backward: axis ascending — ``last`` over the preceding frame is the
    greatest right value ≤ current. Forward: axis DESCENDING — preceding
    rows hold larger axis values, so the same ``last`` picks the smallest
    right value ≥ current. Ties: non-strict sorts right rows before the
    current left row (inside the frame); strict sorts them after (outside
    the ``-1``-ended frame)."""
    axis = F.col(on).desc() if fwd else F.col(on).asc()
    side = F.col("__side").desc() if strict else F.col("__side").asc()
    return (
        W.partitionBy(*by)
        .orderBy(axis, side)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    *,
    strict: bool = False,
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest ``on`` value
    ≤ left's (< when ``strict``). ``by`` adds equality keys (per-group asof).

    ``direction``: 'backward' (default), 'forward' (the SMALLEST right
    value ≥ left's, > when strict), or 'nearest' (the temporally closer of
    the two, ties preferring backward; ``strict`` excludes equal-axis
    matches from both sides). Forward/nearest reuse the backward carry
    window over a descending axis sort, so every direction costs one keyed
    shuffle with incremental O(n) frames (nearest adds a second window
    phase — a local re-sort, not an exchange).

    Ties on the axis: right rows sort before left rows at the same ``on``
    value unless ``strict``, matching ASOF JOIN semantics.

    ``tolerance`` (pandas merge_asof semantics): a match farther than
    ``tolerance`` axis units (seconds for timestamp axes) is discarded —
    the matched columns come back NULL, the left row stays. Implemented
    by also carrying the matched axis value through the same window and
    conditionally nulling — no extra shuffle.
    """
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by, on, *right_cols
    ).withColumn("__side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "nearest":
        wb = _carry_window(by, on, fwd=False, strict=strict)
        wf = _carry_window(by, on, fwd=True, strict=strict)
        carry = list(right_cols) + [on]
        carried = unioned.select(
            "*",
            *[
                F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
                .over(wb)
                .alias(f"__bk_{c}")
                for c in carry
            ],
            *[
                F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
                .over(wf)
                .alias(f"__fw_{c}")
                for c in carry
            ],
        )
        d_bk = F.col(on).cast("double") - F.col(f"__bk_{on}").cast("double")
        d_fw = F.col(f"__fw_{on}").cast("double") - F.col(on).cast("double")
        if tolerance is not None:
            d_bk = F.when(d_bk <= F.lit(float(tolerance)), d_bk)
            d_fw = F.when(d_fw <= F.lit(float(tolerance)), d_fw)
        use_bk = d_bk.isNotNull() & (
            d_fw.isNull() | (d_bk <= d_fw)
        )
        for c in right_cols:
            carried = carried.withColumn(
                f"__asof_{c}",
                F.when(use_bk, F.col(f"__bk_{c}")).otherwise(
                    F.when(d_fw.isNotNull(), F.col(f"__fw_{c}"))
                ),
            )
        out = carried.filter(F.col("__side") == 1).drop(
            "__side",
            *right_cols,
            *[f"__bk_{c}" for c in carry],
            *[f"__fw_{c}" for c in carry],
        )
        for c in right_cols:
            out = out.withColumnRenamed(f"__asof_{c}", c)
        return out

    fwd = direction == "forward"
    w = _carry_window(by, on, fwd=fwd, strict=strict)
    carry = list(right_cols) + ([on] if tolerance is not None else [])
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in carry
        ],
    )
    if tolerance is not None:
        delta = F.col(on).cast("double") - F.col(f"__asof_{on}").cast("double")
        if fwd:
            delta = -delta
        in_tol = delta <= F.lit(float(tolerance))
        for c in right_cols:
            carried = carried.withColumn(
                f"__asof_{c}", F.when(in_tol, F.col(f"__asof_{c}"))
            )
        carried = carried.drop(f"__asof_{on}")
    out = carried.filter(F.col("__side") == 1).drop("__side", *right_cols)
    for c in right_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out
