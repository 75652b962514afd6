"""Secondary index emulation: WITH INDEX query rewrite as a join through a
materialized index table.

Reference: QL's ``SELECT ... FROM t WITH INDEX idx`` rewrites the query to
join through the index table whose key is the indexed column(s) and whose
value is the primary key (TransformWithIndexStatement,
yt/yt/library/query/secondary_index/transform.h:12 + transform.cpp; index
kinds FullSync/Unfolding/Unique).

Spark shape: the index is just a (indexed_cols..., key_cols...) DataFrame —
ideally bucketed/partitioned by the indexed column. A point predicate on the
indexed column prunes the (small) index scan, and the resulting key set
drives a semi-join into the primary table. With parquet min/max stats +
broadcast of the matched keys, the primary scan skips row groups — the same
IO-avoidance the reference gets from its index tablets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_index(table: DataFrame, indexed_cols: list[str], key_cols: list[str]) -> DataFrame:
    """Materialize a FullSync secondary index projection (index table =
    indexed cols + primary key, sorted by indexed cols)."""
    proj = table.select(*indexed_cols, *key_cols)
    return proj.repartitionByRange(*[F.col(c) for c in indexed_cols]).sortWithinPartitions(
        *indexed_cols
    )


def query_with_index(
    table: DataFrame,
    index: DataFrame,
    key_cols: list[str],
    index_predicate: Column,
) -> DataFrame:
    """WITH INDEX rewrite: filter the index, semi-join primaries on key.

    The filtered index side is broadcast (matched key sets are small by
    assumption — that's why an index helps), so the primary table never
    shuffles: scan + broadcast-hash-semi-join only."""
    keys = index.filter(index_predicate).select(*key_cols)
    return table.join(F.broadcast(keys), key_cols, "left_semi")


class UniqueKeyViolationError(ValueError):
    """UniqueKeyViolation (yt/yt/client/table_client/public.h:180): a
    Unique-kind index rejects two primary rows sharing an indexed value."""


def build_unfolding_index(
    table: DataFrame, list_col: str, key_cols: list[str]
) -> DataFrame:
    """Materialize an Unfolding index (ESecondaryIndexKind::Unfolding,
    yt/yt/client/tablet_client/public.h:236-240): ONE index row per
    element of the list column, so ``list_contains(col, x)`` predicates
    become point lookups on the unfolded value.

    The index is element-count-sized (rows × avg list length) but each row
    is narrow (value + primary key); range partitioning on the value keeps
    a point probe to one partition's parquet row groups at scale."""
    unfolded = table.select(
        F.explode(F.col(list_col)).alias("__unfolded"), *key_cols
    ).distinct()
    return unfolded.repartitionByRange(F.col("__unfolded")).sortWithinPartitions(
        "__unfolded"
    )


def query_with_unfolding_index(
    table: DataFrame,
    index: DataFrame,
    key_cols: list[str],
    value,
) -> DataFrame:
    """``WHERE list_contains(col, value)`` through the unfolding index:
    probe the index at the value (partition-pruned point read), broadcast
    the matched key set, semi-join the primary — the primary's list column
    is never exploded, never shuffled."""
    keys = index.filter(F.col("__unfolded") == F.lit(value)).select(*key_cols)
    return table.join(F.broadcast(keys), key_cols, "left_semi")


def build_unique_index(
    table: DataFrame, indexed_cols: list[str], key_cols: list[str]
) -> DataFrame:
    """Materialize a Unique index (ESecondaryIndexKind::Unique): same
    projection as FullSync, but building it VALIDATES that no indexed
    value maps to more than one primary key — the write-path contract the
    reference enforces on insert (UniqueKeyViolation error 306).

    Validation is one partial-agg'd groupBy over the projection (count > 1
    survivors only), so the check costs one index-sized aggregate, not a
    self-join."""
    dup = (
        table.groupBy(*indexed_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        viol = {c: dup[0][c] for c in indexed_cols}
        raise UniqueKeyViolationError(
            f"indexed value {viol} maps to multiple primary rows"
        )
    return build_index(table, indexed_cols, key_cols)
