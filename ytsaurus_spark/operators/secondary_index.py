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
