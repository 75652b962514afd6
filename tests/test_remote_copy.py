"""Cross-cluster RemoteCopy: chunk-verbatim transfer between two
independent YtClient cluster roots (remote_copy_job.cpp semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ytsaurus_spark.client import YtClient
from ytsaurus_spark.sources.remote_copy_job import RemoteCopyError, run_remote_copy


@pytest.fixture
def clusters(spark, tmp_path):
    src = YtClient(root=str(tmp_path / "cluster_a"), spark=spark)
    dst = YtClient(root=str(tmp_path / "cluster_b"), spark=spark)
    return src, dst


def test_remote_copy_static_table(clusters, spark):
    src, dst = clusters
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    src.write_table("//home/t", df.repartition(4))  # multi-chunk source
    summary = dst.run_remote_copy("//home/t", "//copied/t", source_client=src)
    assert summary["chunks"] >= 4 and summary["bytes"] > 0
    back = dst.read_table("//copied/t")
    assert back.count() == 1000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(3 * i for i in range(1000))
    # chunk files moved byte-verbatim: same total parquet payload
    sdir, ddir = src._fs("//home/t"), dst._fs("//copied/t")
    ssize = sum(
        os.path.getsize(os.path.join(sdir, f))
        for f in os.listdir(sdir) if f.endswith(".parquet")
    )
    dsize = sum(
        os.path.getsize(os.path.join(ddir, f))
        for f in os.listdir(ddir) if f.endswith(".parquet")
    )
    assert ssize == dsize


def test_remote_copy_attributes_and_multi_table(clusters, spark):
    src, dst = clusters
    df = spark.createDataFrame([(2, "b"), (1, "a")], "k bigint, s string")
    src.write_table("//t1", df)
    from ytsaurus_spark.sources.formats import _write_attrs, table_attributes

    _write_attrs(src._fs("//t1"), {"sorted_by": ["k"], "user_attr": "x"})
    dst.run_remote_copy("//t1", "//t1c", source_client=src)
    assert table_attributes(dst._fs("//t1c")) == {
        "sorted_by": ["k"],
        "user_attr": "x",
    }

    # multiple sources concatenate; attribute copy then must be off
    src.write_table("//t2", df)
    with pytest.raises(RemoteCopyError):
        dst.run_remote_copy(["//t1", "//t2"], "//cat", source_client=src)
    dst.run_remote_copy(
        ["//t1", "//t2"], "//cat", source_client=src, copy_attributes=False
    )
    assert dst.read_table("//cat").count() == 4


def test_remote_copy_frozen_dynamic_table(clusters, spark):
    src, dst = clusters
    src.create(
        "table",
        "//dyn/t",
        attributes={"dynamic": True, "schema": [{"name": "k", "sort_order": "ascending"}]},
    )
    src.insert_rows("//dyn/t", spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint"))
    # mounted -> refused
    with pytest.raises(RemoteCopyError):
        dst.run_remote_copy("//dyn/t", "//dyn/tc", source_client=src)
    src.freeze_table("//dyn/t")
    dst.run_remote_copy("//dyn/t", "//dyn/tc", source_client=src)
    got = {(r.k, r.v) for r in dst.read_table("//dyn/tc").collect()}
    assert got == {(1, 10), (2, 20)}


def test_remote_copy_missing_source(clusters):
    src, dst = clusters
    with pytest.raises(RemoteCopyError):
        dst.run_remote_copy("//nope", "//copied", source_client=src)
