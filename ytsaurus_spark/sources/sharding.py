"""Hash-sharded table layout: computed shard keys for point-lookup pruning.

Reference: computed key columns like ``farm_hash(user_id) % N`` shard
tablets, and range inference enumerates the modulo ranges so a point
predicate on user_id scans exactly one tablet
(yt/yt/library/query/engine/new_range_inferrer.cpp:50-120).

Spark shape: write with ``partitionBy(shard)`` where shard =
``pmod(xxhash64(key), N)``; ``sharded_lookup`` recomputes the shard from
the key predicate so the scan prunes to one partition directory — the same
one-tablet point read, via Catalyst partition pruning instead of a range
inferrer. (Bit-compat with farm_hash is irrelevant here: the shard function
only needs to match between writer and reader, both ours.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "__shard"


def shard_of(key_col, num_shards: int):
    return F.pmod(F.xxhash64(key_col), num_shards)


def sharded_write(
    df: DataFrame, path: str, key: str, num_shards: int, mode: str = "overwrite"
) -> None:
    out = df.withColumn(SHARD_COL, shard_of(F.col(key), num_shards))
    out.write.mode(mode).partitionBy(SHARD_COL).parquet(path)


def sharded_lookup(
    spark: SparkSession, path: str, key: str, values: list, num_shards: int
) -> DataFrame:
    """Point/batch lookup that prunes to the shards covering ``values``.

    The explicit shard predicate is what the reference's range inferrer
    derives automatically; Catalyst turns it into partition pruning
    (PartitionFilters in the scan), so IO = |hit shards| / num_shards.

    The shard of each literal is computed with the key column's own type
    (hash functions are type-sensitive), using one tiny driver-side plan."""
    df = spark.read.parquet(path)
    key_type = dict(df.dtypes)[key]
    probe = spark.createDataFrame([(v,) for v in values], f"__v {key_type}")
    shard_rows = probe.select(
        shard_of(F.col("__v"), num_shards).alias("s")
    ).distinct().collect()
    shard_list = sorted(r.s for r in shard_rows)
    return df.filter(
        F.col(SHARD_COL).isin(shard_list) & F.col(key).isin(values)
    ).drop(SHARD_COL)
