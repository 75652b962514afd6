"""Skew mitigation: salted joins and two-phase aggregation.

The reference handles skew with job-size balancing (data_balancer.cpp) and
partition splitting in the sort controller; Spark's AQE skew-join covers
sort-merge joins automatically (enabled in session.py). These helpers cover
the cases AQE can't: broadcast-ineligible joins against a replicable side,
and pathological single-key aggregations.

Salting is a correctness-preserving rewrite: results are identical to the
unsalted plan (asserted in tests), only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (skewed) side salted and the right side
    replicated ``salt_factor`` times.

    Hot keys on the left spread across ``salt_factor`` partitions instead of
    hammering one reducer; the right side's replication cost is
    |right| × salt_factor — use when right is small-ish but above the
    broadcast threshold. Join keys and results are unchanged."""
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()), salt_factor)
    )
    replicas = right.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt_factor - 1})"))
    )
    out = salted_l.join(replicas, on + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_factor: int = 16,
) -> DataFrame:
    """Skew-proof sum: aggregate on (key, salt) first, then on key.

    Catalyst's partial aggregation already gives map-side combine; the
    explicit two-phase form additionally splits the *reduce side* of a
    pathological key across ``salt_factor`` reducers before the final
    (tiny) re-aggregation. Use for billion-row single-key groups."""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), salt_factor)
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum")
    )
    return partial.groupBy(*keys).agg(F.sum("__psum").alias(f"sum_{value_col}"))
