"""Scale-machinery tests: salted joins / two-phase agg preserve results;
bucketed tables co-locate joins (no shuffle); weak-schema inference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows_set
from ytsaurus_spark.operators.skew import salted_join, two_phase_agg_sum
from ytsaurus_spark.operators.weak_schema import infer_rest_schema, promote_rest_columns
from ytsaurus_spark.plans import shuffle_count


@pytest.fixture()
def skewed(spark):
    # one hot key (0) with 500 rows, long tail with 1 each
    rows = [(0, i) for i in range(500)] + [(k, k) for k in range(1, 50)]
    return spark.createDataFrame(rows, "k bigint, v bigint")


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 50)], "k bigint, name string"
    )
    plain = skewed.join(dim, ["k"]).select("k", "v", "name")
    salted = salted_join(skewed, dim, ["k"], salt_factor=4).select("k", "v", "name")
    assert rows_set(plain) == rows_set(salted)


def test_salted_left_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([(0, "zero"), (7, "seven")], "k bigint, name string")
    plain = skewed.join(dim, ["k"], "left").select("k", "v", "name")
    salted = salted_join(skewed, dim, ["k"], salt_factor=4, how="left").select(
        "k", "v", "name"
    )
    assert rows_set(plain) == rows_set(salted)


def test_two_phase_agg_sum(spark, skewed):
    direct = {
        r.k: r.s for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    twop = {r.k: r.sum_v for r in two_phase_agg_sum(skewed, ["k"], "v").collect()}
    assert direct == twop


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Co-located joins via bucketing: both sides bucketed on the join key
    → SortMergeJoin without Exchange (the reference's sorted-table merge
    join, yql_yt_join_impl.cpp merge-join strategy)."""
    a = spark.range(0, 10000).withColumn("x", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("y", F.col("id") * 3)
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    a.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bt_a")
    b.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bt_b")
    joined = spark.table("bt_a").join(spark.table("bt_b"), "id")
    assert shuffle_count(joined) == 0
    assert joined.count() == 10000
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_weak_schema_inference_and_promotion(spark):
    df = spark.createDataFrame(
        [
            (1, '{"age": 30, "score": 1.5, "name": "a", "ok": true}'),
            (2, '{"age": 31, "name": "b"}'),
            (3, None),
        ],
        "k bigint, _rest string",
    )
    schema = infer_rest_schema(df)
    assert schema == {
        "age": "bigint",
        "score": "double",
        "name": "string",
        "ok": "boolean",
    }
    out = promote_rest_columns(df, schema, drop_rest=True)
    assert set(out.columns) == {"k", "age", "score", "name", "ok"}
    got = {r.k: (r.age, r.score, r.name, r.ok) for r in out.collect()}
    assert got[1] == (30, 1.5, "a", True)
    assert got[2] == (31, None, "b", None)
    assert got[3] == (None, None, None, None)


def test_weak_schema_type_widening(spark):
    df = spark.createDataFrame(
        [(1, '{"x": 1}'), (2, '{"x": 2.5}'), (3, '{"x": "s"}')],
        "k bigint, _rest string",
    )
    assert infer_rest_schema(df)["x"] == "string"
    df2 = spark.createDataFrame(
        [(1, '{"x": 1}'), (2, '{"x": 2.5}')], "k bigint, _rest string"
    )
    assert infer_rest_schema(df2)["x"] == "double"


def test_sharded_point_lookup_prunes_partitions(spark, tmp_path):
    import os

    from ytsaurus_spark.plans import formatted_plan
    from ytsaurus_spark.sources.sharding import sharded_lookup, sharded_write

    path = os.path.join(str(tmp_path), "sharded")
    df = spark.range(0, 5000).select(
        F.col("id").alias("user_id"), (F.col("id") * 7 % 100).alias("v")
    )
    sharded_write(df, path, "user_id", num_shards=16)
    hit = sharded_lookup(spark, path, "user_id", [42, 4242], num_shards=16)
    rows = {r.user_id: r.v for r in hit.collect()}
    assert rows == {42: 42 * 7 % 100, 4242: 4242 * 7 % 100}
    # the scan must carry partition filters on the shard column
    plan = formatted_plan(
        spark.read.parquet(path).filter(F.col("__shard").isin([3]))
    )
    assert "PartitionFilters" in plan and "__shard" in plan


def test_run_map_multi_output(spark):
    import pandas as pd

    from ytsaurus_spark.operators import map_reduce as mr

    df = spark.createDataFrame([(i,) for i in range(10)], "k bigint")

    def mapper(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"k": pdf["k"], "tag": (pdf["k"] % 2).astype("int32")}
            )

    evens, odds = mr.run_map_multi_output(
        df, mapper, "k bigint, tag int", tag_col="tag", num_outputs=2
    )
    assert {r.k for r in evens.collect()} == {0, 2, 4, 6, 8}
    assert {r.k for r in odds.collect()} == {1, 3, 5, 7, 9}


def test_select_rows_with_totals(spark):
    from tests.conftest import rows_set
    from ytsaurus_spark.operators.select_rows import select_rows, translate_ql

    sql = translate_ql("a, sum(b) AS sb FROM [//t] GROUP BY a WITH TOTALS")
    assert "GROUP BY ROLLUP(a)" in sql
    spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "a bigint, b bigint"
    ).createOrReplaceTempView("wt")
    out = select_rows(spark, "a, sum(b) AS sb FROM [//x/wt] GROUP BY a WITH TOTALS")
    assert rows_set(out) == {(1, 15), (2, 7), (None, 22)}


def test_weak_schema_bool_mix_widens_to_string(spark):
    df = spark.createDataFrame(
        [(1, '{"x": true}'), (2, '{"x": 3}')], "k bigint, _rest string"
    )
    assert infer_rest_schema(df)["x"] == "string"
    df2 = spark.createDataFrame(
        [(1, '{"x": 3}'), (2, '{"x": true}')], "k bigint, _rest string"
    )
    assert infer_rest_schema(df2)["x"] == "string"
