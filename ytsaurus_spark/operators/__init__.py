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


def python_stage_width(df: DataFrame) -> int:
    """Partition count for a keyed shuffle FEEDING A PER-KEY PYTHON
    REDUCER: cluster parallelism as the floor, byte-derived above it.

    AQE coalesces post-shuffle partitions by BYTES, which misprices an
    opaque per-key Python stage: the stage's cost driver is user-code
    invocations per key (~0.4 ms each), not bytes, so a few MB of keys
    coalesce to ONE task and the whole per-key pass runs on one core
    (measured: the 15k-key multi-input reduce at sf0.1 was 6.1 s AQE-
    coalesced vs 0.9 s at cluster width — the 5.5 s of per-key pandas
    work is embarrassingly parallel). The floor is the cluster's
    parallelism (never a constant); the byte term ceil(lineage input
    bytes / maxPartitionBytes) takes over at scale, where the floor is
    irrelevant and per-task sort memory bounds partition size. Use ONLY
    where the reducer is per-key-cost dominated — a cheap reducer over
    few heavy keys is faster on AQE's byte-coalesced width (measured on
    the single-input sorted reduce: pinning width was ~1.5x slower)."""
    import os

    spark = df.sparkSession
    floor = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        if not files:
            return floor
        total = 0
        for f in files:
            if not f.startswith("file:"):
                return floor
            total += os.path.getsize(f[len("file:"):])
        max_split = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            .rstrip("b")
        )
        return max(floor, -(-total // max_split))
    except Exception:
        return floor
