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


class IndexedKeyedTable:
    """Write-through index maintenance: a KeyedTable plus its secondary
    indexes, updated TOGETHER on every mutation — the reference maintains
    index tablets inside the same tablet transaction as the base write
    (secondary_index/transform.cpp; unique violations abort the write
    with UniqueKeyViolation before anything commits).

    Index maintenance is INCREMENTAL: only entries of the mutated keys
    are replaced — ``idx' = (idx ∖ entries-of-affected-keys) ∪
    projection-of-affected-rows-after-merge`` — two key-grain joins per
    index, never a full index rebuild. At scale the affected-key set is
    write-batch-sized and broadcasts.

    ``indexes`` maps index name → spec dict:
      {"kind": "full_sync" | "unique", "columns": [indexed cols]} or
      {"kind": "unfolding", "column": <list col>}
    """

    def __init__(self, table, indexes: dict[str, dict],
                 _index_dfs: dict[str, DataFrame] | None = None) -> None:
        from ytsaurus_spark.operators.keyed_tables import KeyedTable

        if not isinstance(table, KeyedTable):
            raise TypeError("IndexedKeyedTable wraps a KeyedTable")
        self.table = table
        self.indexes = indexes
        if _index_dfs is not None:
            self._index_dfs = _index_dfs
        else:
            self._index_dfs = {
                name: self._project(table.df, spec)
                for name, spec in indexes.items()
            }
            for name, spec in indexes.items():
                if spec["kind"] == "unique":
                    self._check_unique_within(self._index_dfs[name], spec)

    # -- projections -----------------------------------------------------

    def _project(self, rows: DataFrame, spec: dict) -> DataFrame:
        keys = self.table.key_cols
        if spec["kind"] == "unfolding":
            return rows.select(
                F.explode(F.col(spec["column"])).alias("__unfolded"), *keys
            ).distinct()
        return rows.select(*spec["columns"], *keys)

    @staticmethod
    def _check_unique_within(proj: DataFrame, spec: dict) -> None:
        dup = (
            proj.groupBy(*spec["columns"])
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            viol = {c: dup[0][c] for c in spec["columns"]}
            raise UniqueKeyViolationError(
                f"indexed value {viol} maps to multiple primary rows"
            )

    # -- reads -----------------------------------------------------------

    def index(self, name: str) -> DataFrame:
        return self._index_dfs[name]

    def lookup_via_index(self, name: str, predicate: Column) -> DataFrame:
        spec = self.indexes[name]
        if spec["kind"] == "unfolding":
            keys = self._index_dfs[name].filter(predicate).select(
                *self.table.key_cols
            )
            return self.table.df.join(
                F.broadcast(keys), self.table.key_cols, "left_semi"
            )
        return query_with_index(
            self.table.df, self._index_dfs[name], self.table.key_cols, predicate
        )

    # -- writes: base + every index advance together ----------------------

    def insert_rows(self, new_rows: DataFrame, update: bool = False) -> "IndexedKeyedTable":
        keys = self.table.key_cols
        new_table = self.table.insert_rows(new_rows, update=update)
        affected = new_rows.select(*keys).distinct()
        merged_rows = new_table.df.join(F.broadcast(affected), keys, "left_semi")
        new_idx: dict[str, DataFrame] = {}
        for name, spec in self.indexes.items():
            fresh = self._project(merged_rows, spec)
            if spec["kind"] == "unique":
                # the write ABORTS before commit on a violation: incoming
                # values must not collide with OTHER keys' entries, nor
                # among themselves
                self._check_unique_within(fresh, spec)
                others = self._index_dfs[name].join(
                    F.broadcast(affected), keys, "left_anti"
                )
                clash = (
                    fresh.select(*spec["columns"])
                    .join(others.select(*spec["columns"]), spec["columns"])
                    .limit(1)
                    .collect()
                )
                if clash:
                    viol = {c: clash[0][c] for c in spec["columns"]}
                    raise UniqueKeyViolationError(
                        f"indexed value {viol} already present under a "
                        "different primary key"
                    )
            kept = self._index_dfs[name].join(
                F.broadcast(affected), keys, "left_anti"
            )
            new_idx[name] = kept.unionByName(fresh)
        return IndexedKeyedTable(new_table, self.indexes, _index_dfs=new_idx)

    def delete_rows(self, keys_df: DataFrame) -> "IndexedKeyedTable":
        keys = self.table.key_cols
        new_table = self.table.delete_rows(keys_df)
        new_idx = {
            name: df.join(F.broadcast(keys_df.select(*keys)), keys, "left_anti")
            for name, df in self._index_dfs.items()
        }
        return IndexedKeyedTable(new_table, self.indexes, _index_dfs=new_idx)
