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
