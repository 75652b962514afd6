"""Operation layer: MapReduce operation types, QL helpers, and the
LLM-data-pipeline operators, all expressed as DataFrame transforms."""

from __future__ import annotations

from pyspark.sql import DataFrame


def conf_bytes(spark, key: str, default: int) -> int:
    """Byte-valued Spark conf with k/m/g/t suffix support.

    ``spark.sql.files.maxPartitionBytes`` may be set as a plain number,
    ``...b``, or a unit-suffixed string like ``128m``; the former
    ``int(conf.rstrip('b'))`` copies silently fell back to their defaults
    on suffixed values (and ``_small_star_input`` returned False), so the
    width/spread heuristics quietly ignored the operator's real split
    size. One shared parser, used by every byte-derived decision."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    try:
        if raw.endswith("b"):
            raw = raw[:-1]
        mult = 1
        if raw and raw[-1] in "kmgtp":
            mult = {
                "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
                "t": 1 << 40, "p": 1 << 50,
            }[raw[-1]]
            raw = raw[:-1]
        val = int(float(raw) * mult) if "." in raw else int(raw) * mult
        return val if val > 0 else default
    except Exception:
        return default


def _local_input_bytes(df: DataFrame) -> int | None:
    """Total bytes of ``df``'s file-backed inputs, or None when the
    lineage has no files or any source is non-local (remote storage plans
    its own splits; byte-deriving from it needs a real listing, not a
    stat call)."""
    import os

    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for f in files:
        if not f.startswith("file:"):
            return None
        total += os.path.getsize(f[len("file:"):])
    return total


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
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
        total = _local_input_bytes(df)
        if total is None:
            return df  # non-local/unknown source: trust its split planning
        max_split = conf_bytes(
            spark, "spark.sql.files.maxPartitionBytes", 134217728
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
    bounded by the session width. Non-local/unknown sources keep the
    session width (their true size is not stat()-able here)."""
    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        total = _local_input_bytes(df)
        if total is None:
            return width  # non-local source: keep the session width
        max_split = conf_bytes(
            spark, "spark.sql.files.maxPartitionBytes", 134217728
        )
        return max(1, min(width, -(-total // max_split)))
    except Exception:
        return width


def python_stage_width(df: DataFrame) -> int | None:
    """Partition count for a keyed shuffle FEEDING A PER-KEY PYTHON
    REDUCER: cluster parallelism as the floor, byte-derived above it —
    or ``None`` (caller must NOT pin) when the input size is unknowable.

    AQE coalesces post-shuffle partitions by BYTES, which misprices an
    opaque per-key Python stage: the stage's cost driver is user-code
    invocations per key (~0.4 ms each), not bytes, so a few MB of keys
    coalesce to ONE task and the whole per-key pass runs on one core
    (measured: the 15k-key multi-input reduce at sf0.1 was 6.1 s AQE-
    coalesced vs 0.9 s at cluster width — the 5.5 s of per-key pandas
    work is embarrassingly parallel). The floor is the cluster's
    parallelism (never a constant); the byte term ceil(lineage input
    bytes / maxPartitionBytes) takes over at scale, where the floor is
    irrelevant and per-task sort memory bounds partition size. For a
    NON-LOCAL or file-less source the bytes are unknowable here, and a
    bare cluster-parallelism pin would hold total_bytes/cores per
    partition at scale (blowing per-task sort memory) — return None and
    let the caller fall back to the unpinned keyed repartition, exactly
    as spread_scan defers to remote split planning. Use ONLY where the
    reducer is per-key-cost dominated — a cheap reducer over few heavy
    keys is faster on AQE's byte-coalesced width (measured on the
    single-input sorted reduce: pinning width was ~1.5x slower)."""
    spark = df.sparkSession
    floor = spark.sparkContext.defaultParallelism
    try:
        total = _local_input_bytes(df)
        if total is None:
            return None
        max_split = conf_bytes(
            spark, "spark.sql.files.maxPartitionBytes", 134217728
        )
        return max(floor, -(-total // max_split))
    except Exception:
        return None
