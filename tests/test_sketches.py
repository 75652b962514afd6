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


def test_kmv_intersect_exact_below_k(spark):
    from ytsaurus_spark.operators.sketches import kmv_build, kmv_intersect_estimate

    a = spark.createDataFrame([("g", i) for i in range(30)], "g string, v long")
    b = spark.createDataFrame([("g", i) for i in range(20, 50)], "g string, v long")
    est = kmv_intersect_estimate(
        kmv_build(a, "g", "v", k=64), kmv_build(b, "g", "v", k=64), "g", k=64
    ).collect()[0]
    # union 50 < k and both sketches uncapped: everything is exact
    assert est["est_union"] == 50
    assert est["est_intersect"] == 10
    assert est["k_overlap"] == 10
    assert abs(est["jaccard"] - 10 / 50) < 1e-9


def test_kmv_intersect_estimates_large_overlap(spark):
    from ytsaurus_spark.operators.sketches import kmv_build, kmv_intersect_estimate

    # |A| = |B| = 3000, |A ∩ B| = 1500 (true Jaccard = 1/3)
    a = spark.createDataFrame([("g", i) for i in range(3000)], "g string, v long")
    b = spark.createDataFrame(
        [("g", i) for i in range(1500, 4500)], "g string, v long"
    )
    est = kmv_intersect_estimate(
        kmv_build(a, "g", "v", k=256), kmv_build(b, "g", "v", k=256), "g", k=256
    ).collect()[0]
    assert 3500 < est["est_union"] < 5500      # true 4500
    assert 900 < est["est_intersect"] < 2100   # true 1500
    assert 0.15 < est["jaccard"] < 0.55        # true 0.333


def test_count_min_upper_bound_and_merge(spark):
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators import sketches

    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 3, "v string")
    b = spark.createDataFrame([("x",)] * 5 + [("z",)] * 7, "v string")
    sk_a = sketches.count_min_build(a, "v", depth=4, width=8)
    sk_b = sketches.count_min_build(b, "v", depth=4, width=8)
    # cell-wise merge == sketch of the concatenated stream
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    sk_ab = sketches.count_min_build(a.unionByName(b), "v", depth=4, width=8)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in sk_ab.collect()
    }
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
    est = {
        r.v: r.cms_est
        for r in sketches.count_min_estimate(
            merged, probes, "v", depth=4, width=8
        ).collect()
    }
    assert est["x"] >= 15 and est["y"] >= 3 and est["z"] >= 7
