"""Time-series densification and resampling as declarative plans.

The reference's time-ordered processing (ordered dynamic tables,
``$timestamp`` reads — yt/yt/client/table_client/schema.h ordered-table
attributes; windowed QL over log tables) leaves gap handling to the
query. These operators make the two standard shapes first-class:

- ``gap_fill``   — densify a per-key time series onto a fixed grid,
  emitting zero/null rows for missing buckets. Per key: aggregate to
  (min, max), ``sequence()`` + ``explode`` the grid, LEFT join the
  observed buckets back. The grid explode is per-key (never a global
  cross join) and the join is an equi-join on (key, bucket) — both
  sides partition on the same key, so at 100 TB this is one co-located
  shuffle; grid size is bounded by the key's own span.
- ``resample``   — bucket to a coarser grain with an aggregate, then
  forward-fill empty buckets from the last observed value with
  ``last(..., ignorenulls)`` over a KEY-PARTITIONED window (never
  global; each key's frames sort only that key's buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["gap_fill", "resample"]


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    fill: float | None = 0.0,
) -> DataFrame:
    """Densify (key, bucket, value) onto a fixed ``step`` grid spanning
    each key's own [min(ts), max(ts)] range. Missing buckets get
    ``fill`` (None keeps them null for a later interpolation pass)."""
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.date_trunc(
        "day", F.col(ts_col)
    )
    observed = (
        df.groupBy(F.col(key_col).alias("k"), bucket.alias("bucket"))
        .agg(F.sum(value_col).alias("v"))
    )
    spans = observed.groupBy("k").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "k",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {step}"))
        ).alias("bucket"),
    )
    filled = grid.join(observed, ["k", "bucket"], "left")
    v = F.col("v") if fill is None else F.coalesce(F.col("v"), F.lit(float(fill)))
    return filled.select(
        F.col("k").alias(key_col),
        F.col("bucket"),
        v.alias(value_col),
    )


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Resample to ``step`` grain and forward-fill gaps from the last
    observed bucket (per key). The fill window partitions on the key."""
    dense = gap_fill(df, key_col, ts_col, value_col, step=step, fill=None)
    w = W.partitionBy(key_col).orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return dense.select(
        key_col,
        "bucket",
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("was_gap"),
    )
