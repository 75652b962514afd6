"""Operation layer: MapReduce operation types, QL helpers, and the
LLM-data-pipeline operators, all expressed as DataFrame transforms."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism IFF the upstream scan
    cannot provide it.

    Single-row-group parquet files (and small inputs generally) give the
    scan stage one task, so an operator whose cost is per-row compute
    (md5 shingle hashing, hyperplane folds) runs on one core regardless of
    cluster size. When the scan's split count is below the cluster's
    default parallelism, one cheap round-robin exchange of the raw rows
    buys full-width compute; when the input is large enough to split
    naturally (the 100 TB case: partitions ≥ cores), this is a no-op —
    the decision derives from input size, never a constant.
    """
    import os

    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
        files = df.inputFiles()
        if not files:
            return df
        total = 0
        for f in files:
            if not f.startswith("file:"):
                return df  # non-local source: trust its split planning
            total += os.path.getsize(f[len("file:"):])
        max_split = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            .rstrip("b")
        )
        splits = max(1, -(-total // max_split))  # Spark's own split count bound
        if splits < target:
            return df.repartition(target)
    except Exception:
        pass
    return df


def keyed_cache_width(df: DataFrame) -> int:
    """Byte-derived partition count for a KEYED repartition that feeds a
    loop-invariant persist (iterative graph/label-propagation operators).

    A bare ``repartition(col)`` pins the cache at the session shuffle
    width, and AQE cannot coalesce a user-specified repartition — so at
    bench scale every downstream iteration inherits a far-too-wide plan
    (measured 2× wall on pagerank at sf0.1), while a plain persist's
    ENSURE_REQUIREMENTS exchange would have been byte-coalesced. This is
    AQE's own rule applied where AQE cannot reach (the same derivation as
    streaming's ``_state_width``): ceil(lineage input bytes /
    maxPartitionBytes), clamped to [1, session shuffle width]. At 100 TB
    the clamp binds and the width IS the cluster width; locally it tracks
    the data. The lineage-bytes proxy undercounts frames that expand
    their source (exploded co-occurrence); the clamp keeps that error
    bounded by the session width.
    """
    import os

    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        files = df.inputFiles()
        if not files:
            return width
        total = 0
        for f in files:
            if not f.startswith("file:"):
                return width  # non-local source: keep the session width
            total += os.path.getsize(f[len("file:"):])
        max_split = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            .rstrip("b")
        )
        return max(1, min(width, -(-total // max_split)))
    except Exception:
        return width
