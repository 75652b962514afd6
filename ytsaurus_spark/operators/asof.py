"""As-of / range join — a training-pipeline staple Spark lacks natively.

Implemented as a composition of built-in ops (no UDF): tag both sides, union
on the shared sort axis, carry the most recent right-side row forward with a
``last(ignorenulls)`` window, keep left rows. One shuffle (the window's
partitionBy), fully codegen'd — scales like any window aggregate and avoids
the per-group ``pd.merge_asof`` Python path entirely.

DuckDB's native ASOF JOIN serves as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


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
    ``direction='forward'`` flips the axis: the SMALLEST right value ≥
    left's (> when strict), pandas merge_asof's forward mode — same
    single-window plan with the frame mirrored to FOLLOWING.

    Ties on the axis: right rows sort before left rows at the same ``on``
    value unless ``strict``, matching ASOF JOIN semantics.

    ``tolerance`` (pandas merge_asof semantics): a match older than
    ``tolerance`` axis units (seconds for timestamp axes) is discarded —
    the matched columns come back NULL, the left row stays. Implemented
    by also carrying the matched axis value through the same window and
    conditionally nulling — no extra shuffle, same single-window plan.
    """
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by, on, *right_cols
    ).withColumn("__side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        # both carry windows over the SAME keyed union — one shuffle, two
        # window phases (orderings differ only in the tie column, so the
        # second phase is a local re-sort, not another exchange); per row
        # the closer match wins, ties prefer backward (documented rule).
        wb = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        wf = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(0, W.unboundedFollowing)
        )
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
                F.first(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
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
    # strict: right rows at the same axis value must NOT be visible to left
    # rows at that value. Backward: order right AFTER left at equal `on`
    # (beyond the frame end). Forward: the mirror — order right BEFORE
    # left at equal `on` (before the frame start); non-strict forward
    # orders left first so equal-axis right rows fall inside the
    # FOLLOWING frame.
    if fwd:
        side_order = F.col("__side").asc() if strict else F.col("__side").desc()
        frame = (0, W.unboundedFollowing)
    else:
        side_order = F.col("__side").desc() if strict else F.col("__side").asc()
        frame = (W.unboundedPreceding, -1 if strict else 0)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(*frame)
    )
    pick = F.first if fwd else F.last
    carry = list(right_cols) + ([on] if tolerance is not None else [])
    carried = unioned.select(
        "*",
        *[
            pick(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
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
