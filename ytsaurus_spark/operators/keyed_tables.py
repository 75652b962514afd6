"""Keyed (sorted dynamic) tables: upsert / lookup / delete / aggregate
columns, re-expressed as pure DataFrame set operations.

Reference semantics: sorted dynamic tables are key-unique MVCC stores
(yt/yt/server/node/tablet_node/sorted_dynamic_store.h:203) with
- InsertRows = upsert by key (or ``update=True`` partial-column update),
- LookupRows = point/batch read by key set,
- DeleteRows = tombstone by key,
- aggregate columns folding new into old on write via sum/min/max/first
  (sorted_dynamic_store.cpp:411; tests
  yt/yt/tests/integration/dynamic_tables/test_aggregate_columns.py).

Spark shape: the table is a DataFrame snapshot; each mutation produces a new
snapshot via anti-join + union (the MERGE pattern — with Delta available the
same calls lower to MERGE INTO). Aggregate folding happens with groupBy over
(old ∪ new), which Catalyst executes as one shuffle on the key — at scale
this is the standard copy-on-write upsert, amortized by partition pruning
when snapshots are key-partitioned.

Versioning: ``KeyedTable`` keeps a bounded list of prior snapshots —
table-level time travel (read @ version), the documented approximation of
row-level MVCC timestamps (SURVEY §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG_FOLDS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    # "first" keeps the FIRST-WRITTEN value (sorted_dynamic_store.cpp:411:
    # the stored value wins; incoming only fills a hole). Resolved
    # generation-aware in insert_rows — F.first over an unordered groupBy
    # would be nondeterministic.
    "first": None,
    # "xdelta" folds binary BASE/PATCH states (builtin_function_registry
    # xdelta aggregate; library/cpp/xdelta3/state/merge.cpp MergeStates) —
    # resolved generation-aware below via an Arrow-batched pandas fold.
    "xdelta": None,
}

_XDELTA_FOLD_UDF = None


def _xdelta_fold_udf():
    """Lazily-built pandas UDF folding a key's generation-ordered xdelta
    states (functions/xdelta.py merge_states decision table). Arrow moves
    each key's state array in one batch; the fold is O(total patch bytes)."""
    global _XDELTA_FOLD_UDF
    if _XDELTA_FOLD_UDF is None:
        import pandas as pd
        from pyspark.sql.types import BinaryType

        from ytsaurus_spark.functions.xdelta import fold_states

        @F.pandas_udf(BinaryType())
        def _fold(arrs: pd.Series) -> pd.Series:
            return arrs.map(
                lambda states: None
                if states is None
                else fold_states(bytes(s) for s in states)
            )

        _XDELTA_FOLD_UDF = _fold
    return _XDELTA_FOLD_UDF


def _first_written(c: str):
    """Deterministic 'first' fold: the non-null value of the LOWEST
    (generation, sub-position) — stored=0 beats incoming=1, and within one
    batch the lowest seq wins; residual ties break by value min, keeping
    the fold order-independent."""
    pair = F.when(
        F.col(c).isNotNull(),
        F.struct(
            F.col("__gen").alias("g"), F.col("__sub").alias("s"), F.col(c).alias("v")
        ),
    )
    return F.min(pair).getField("v")


def _custom_fold(c: str, merge):
    """User-supplied binary fold, applied over the key's non-null values in
    generation order (oldest first).

    Honors the reference's fold-on-write interface for aggregates with no
    built-in SQL analog — e.g. xdelta's patch merging
    (builtin_function_registry.cpp:246), whose patch format is not public:
    the user supplies ``merge(acc, value) -> Column`` and the engine
    guarantees deterministic application order. The fold stays JVM-side
    (higher-order ``aggregate`` over a gen-sorted collect_list); ties
    within one generation break by value, keeping it order-independent."""
    pair = F.when(
        F.col(c).isNotNull(),
        F.struct(
            F.col("__gen").alias("g"), F.col("__sub").alias("s"), F.col(c).alias("v")
        ),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(pair)), lambda s: s.getField("v")
    )
    rest = F.slice(ordered, F.lit(2), F.greatest(F.size(ordered) - 1, F.lit(0)))
    return F.when(F.size(ordered) == 0, F.lit(None)).otherwise(
        F.aggregate(rest, F.try_element_at(ordered, F.lit(1)), merge)
    )


def _fold_expr(c: str, fold):
    """Fold spec (name or callable) → aggregation expression for column c."""
    if callable(fold):
        return _custom_fold(c, fold).alias(c)
    if fold == "first":
        return _first_written(c).alias(c)
    if fold == "xdelta":
        pair = F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.col("__gen").alias("g"),
                F.col("__sub").alias("s"),
                F.col(c).alias("v"),
            ),
        )
        ordered = F.transform(
            F.array_sort(F.collect_list(pair)), lambda s: s.getField("v")
        )
        return _xdelta_fold_udf()(ordered).alias(c)
    return _AGG_FOLDS[fold](F.col(c)).alias(c)


def _check_folds(aggregates: dict) -> None:
    for col, fn in aggregates.items():
        if not callable(fn) and fn not in _AGG_FOLDS:
            raise ValueError(f"unsupported aggregate {fn} for {col}")


@dataclass
class KeyedTable:
    """A key-unique table snapshot with optional aggregate columns.

    ``aggregates`` maps column name → fold function name; non-key,
    non-aggregate columns take the newest value on upsert (last-writer-wins,
    like the reference's plain value columns).
    """

    df: DataFrame
    key_cols: list[str]
    aggregates: dict[str, str] = field(default_factory=dict)
    max_versions: int = 4
    _history: list[DataFrame] = field(default_factory=list)

    def __post_init__(self) -> None:
        _check_folds(self.aggregates)

    # -- reads --------------------------------------------------------------

    def lookup_rows(self, keys: DataFrame) -> DataFrame:
        """LookupRows: rows matching the key set. left_semi keeps the scan
        one-sided; with few keys Catalyst broadcasts them (the reference's
        batched key lookup, cg_routines.cpp:491)."""
        return self.df.join(F.broadcast(keys), self.key_cols, "left_semi")

    def read(self, version: int = -1) -> DataFrame:
        """Snapshot read; negative = current, else history index (oldest=0).
        Table-level time travel (Delta `VERSION AS OF` analog)."""
        if version == -1 or not self._history:
            return self.df
        return self._history[max(0, min(version, len(self._history) - 1))]

    # -- writes -------------------------------------------------------------

    def insert_rows(self, new_rows: DataFrame, update: bool = False) -> "KeyedTable":
        """Upsert. For aggregate columns the incoming value folds into the
        stored one (old ⊕ new); plain columns are overwritten by the new row.

        ``update=True`` is InsertRows' partial-column mode (update==true in
        the reference's insert options): ``new_rows`` may omit value
        columns; omitted columns keep their stored value for existing keys
        and are null for new keys."""
        cols = self.df.columns
        missing = [c for c in cols if c not in new_rows.columns]
        if missing and not update:
            raise ValueError(
                f"insert_rows missing columns {missing}; pass update=True "
                "for partial-column upsert"
            )
        if missing:
            # Omitted PLAIN columns keep their stored value (new keys ->
            # null); omitted AGGREGATE columns contribute a null delta (the
            # fold identity) — pulling the stored value would double-count.
            plain_missing = [c for c in missing if c not in self.aggregates]
            if plain_missing:
                current = self.df.select(*self.key_cols, *plain_missing)
                new_rows = new_rows.join(current, self.key_cols, "left")
            for c in missing:
                if c in self.aggregates:
                    dtype = dict(self.df.dtypes)[c]
                    new_rows = new_rows.withColumn(c, F.lit(None).cast(dtype))
        new_rows = new_rows.select(*cols)
        if self.aggregates:
            # fold = groupBy over (current ∪ incoming): one shuffle on the
            # key, partial aggregation map-side — same cost as the MERGE.
            tagged_old = self.df.withColumn("__gen", F.lit(0)).withColumn(
                "__sub", F.lit(0).cast("long")
            )
            tagged_new = new_rows.withColumn("__gen", F.lit(1)).withColumn(
                "__sub", F.lit(0).cast("long")
            )
            union = tagged_old.unionByName(tagged_new, allowMissingColumns=True)
            aggs = []
            for c in cols:
                if c in self.key_cols:
                    continue
                if c in self.aggregates:
                    aggs.append(_fold_expr(c, self.aggregates[c]))
                else:
                    # newest generation wins for plain columns
                    aggs.append(
                        F.max_by(F.col(c), F.struct("__gen")).alias(c)
                    )
            merged = union.groupBy(*self.key_cols).agg(*aggs).select(*cols)
        else:
            keep = self.df.join(new_rows, self.key_cols, "left_anti")
            merged = keep.unionByName(new_rows).select(*cols)
        return self._advance(merged)

    def delete_rows(self, keys: DataFrame) -> "KeyedTable":
        return self._advance(self.df.join(keys, self.key_cols, "left_anti"))

    def merge_rows(self, source: DataFrame, **merge_kwargs) -> "KeyedTable":
        """SQL:2003 MERGE INTO this snapshot (operators/merge.py): ONE
        full-outer join on the key columns with multi-clause
        update/delete/insert semantics — the composite the reference
        expresses as upsert+delete batches and lakehouse formats expose as
        MERGE INTO. Returns the next snapshot (history advances like any
        other write)."""
        from ytsaurus_spark.operators.merge import merge_into

        merge_kwargs.setdefault("on", list(self.key_cols))
        return self._advance(merge_into(self.df, source, **merge_kwargs))

    # -- sharding (tablet management) ---------------------------------------

    def pivot_keys(self, num_tablets: int) -> list:
        """GetTablePivotKeys analog (table_client.h:417): the key-range
        boundaries an even ``num_tablets``-way split would use, from
        approximate quantiles of the first key column."""
        key = self.key_cols[0]
        qs = [i / num_tablets for i in range(1, num_tablets)]
        return self.df.approxQuantile(key, qs, 0.01)

    def reshard(self, num_tablets: int) -> DataFrame:
        """ReshardTable analog (table_client.h:389-394): rewrite the table
        range-partitioned on the key into ``num_tablets`` tablets; each
        output partition holds one contiguous key range (pivot boundaries =
        the range partitioner's sampled bounds)."""
        cols = [F.col(c) for c in self.key_cols]
        return self.df.repartitionByRange(num_tablets, *cols).sortWithinPartitions(
            *cols
        )

    def _advance(self, new_df: DataFrame) -> "KeyedTable":
        hist = (self._history + [self.df])[-self.max_versions:]
        return KeyedTable(
            df=new_df,
            key_cols=self.key_cols,
            aggregates=self.aggregates,
            max_versions=self.max_versions,
            _history=hist,
        )


    def reshard_with_pivots(self, pivots: list) -> DataFrame:
        """ReshardTable with EXPLICIT pivot keys (the reference's primary
        form — ReshardTable(path, pivot_keys), table_client.h:389-394):
        tablet i holds keys in [pivot[i-1], pivot[i]), tablet 0 everything
        below the first pivot. Returns the table with its ``tablet``
        assignment, hash-partitioned by tablet so each tablet's rows are
        co-located — deterministic, unlike the sampled bounds of
        ``reshard`` (which mirrors the no-pivots auto form)."""
        key = self.key_cols[0]
        tablet = sum(
            (F.when(F.col(key) >= F.lit(p), 1).otherwise(0) for p in pivots),
            F.lit(0),
        )
        out = self.df.withColumn("tablet", tablet.cast("int"))
        return out.repartition(max(1, len(pivots) + 1), "tablet")
