"""KMV sketch: estimate accuracy, exact-below-k, merge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ytsaurus_spark.operators.sketches import kmv_build, kmv_estimate, kmv_merge


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], ["g", "v"]
    )
    out = kmv_estimate(kmv_build(df, "g", "v", k=64), k=64).collect()
    assert out[0].est == 10  # under k distinct -> exact


def test_estimate_within_tolerance_above_k(spark):
    df = spark.range(0, 5000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    out = kmv_estimate(kmv_build(df, "g", "v", k=64), k=64).collect()
    est = out[0].est
    assert 0.6 * 5000 < est < 1.6 * 5000  # k=64 -> ~12% rsd; generous band


def test_merge_equals_direct_sketch(spark):
    # sketch(A union B) == merge(sketch(A), sketch(B)) -- the mergeability law
    a = spark.range(0, 3000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    direct = kmv_build(a.unionByName(b), "g", "v", k=64).collect()[0].hashes
    merged = kmv_merge(
        kmv_build(a, "g", "v", k=64), kmv_build(b, "g", "v", k=64), "g", k=64
    ).collect()[0].hashes
    assert direct == merged
