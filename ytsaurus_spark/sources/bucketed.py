"""Bucketed (sorted, co-located) tables — the Spark twin of the
reference's SORTED tables, whose key order is what lets a sorted
controller line up primary and foreign inputs for a merge-join without
any data movement (sorted_controller.cpp slices primary/foreign chunks by
key range; operations/reduce: "input tables must be sorted by join_by").

Spark-first mapping: ``bucketBy(n, keys).sortBy(keys)`` persists the hash
partitioning AND the per-bucket sort into table metadata, so any later
equi-join or aggregation on those keys satisfies its required
distribution straight off the scan — no Exchange, no Sort, at any scale.
This is the durable sibling of a transient ``repartition(keys)``: the
shuffle is paid ONCE at write time and amortized over every subsequent
query, which is exactly how the reference treats sorting (Sort once,
sorted-reduce forever after).

At 100 TB: pick the bucket count so one bucket of the LARGER table fits
an executor core's working set (buckets are the unit of join
parallelism — too few starves the cluster, too many makes small files);
both sides must agree on (keys, count) for the exchange-free join, the
same contract the reference's join_by imposes on its sorted inputs.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and by
    default per-bucket sorted) on ``keys``. The one-time shuffle that
    this write pays is the one every future join/agg on ``keys`` skips.

    The pre-write ``repartition(n_buckets, keys)`` uses the same
    murmur3 hash as the bucketing spec, so every task holds exactly one
    bucket and writes exactly one file — the condition under which Spark
    trusts the ``sortBy`` metadata at read time (multi-file buckets fall
    back to a re-sort; the ordering also needs
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``, which
    ``co_located_join``/``BucketedPair`` set)."""
    df = df.repartition(n_buckets, *keys)
    w = df.write.format("parquet").option("path", path)
    w = w.bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode("overwrite").saveAsTable(name)


def co_located_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: list[str],
) -> DataFrame:
    """Equi-join two tables registered with matching (keys, bucket count).
    With bucketing metadata in the catalog the planner sees both scans as
    hash-distributed (and sorted) on the join keys, so the SortMergeJoin
    plans with ZERO Exchange and ZERO Sort operators — pinned by
    tests/test_plans.py::test_bucketed_join_no_exchange."""
    return spark.table(left).join(spark.table(right), on=on)


class BucketedPair:
    """Context manager building a throwaway co-located table pair (used
    by the registry query and tests): unique table names per run, both
    tables dropped and files removed on exit."""

    def __init__(
        self,
        spark: SparkSession,
        left: DataFrame,
        right: DataFrame,
        keys_left: list[str],
        keys_right: list[str],
        n_buckets: int,
        root: str,
    ):
        self.spark = spark
        # honor per-bucket sortBy metadata at scan time (one file per
        # bucket is guaranteed by write_bucketed's repartition)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        tag = uuid.uuid4().hex[:12]
        self.lname = f"ytspark_bl_{tag}"
        self.rname = f"ytspark_br_{tag}"
        self.root = root
        write_bucketed(
            left, self.lname, keys_left, n_buckets, f"{root}/{self.lname}"
        )
        write_bucketed(
            right, self.rname, keys_right, n_buckets, f"{root}/{self.rname}"
        )

    def __enter__(self) -> "BucketedPair":
        return self

    def left(self) -> DataFrame:
        return self.spark.table(self.lname)

    def right(self) -> DataFrame:
        return self.spark.table(self.rname)

    def __exit__(self, *exc) -> None:
        for n in (self.lname, self.rname):
            self.spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(self.root, ignore_errors=True)
