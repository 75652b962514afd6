"""Plan-shape regression tests: the scale properties (pushdown, pruning,
broadcast, bounded shuffles) asserted on real query plans, so a refactor
that silently loses one fails CI — the 100 TB design enforced at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ytsaurus_spark.catalog import load_tables
from ytsaurus_spark.plans import (
    broadcast_join_count,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
)
from ytsaurus_spark.queries.ql import ql_group_agg, ql_join_inner, ql_order_limit


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    cat = load_tables(spark, sf_dir)
    df = cat.read("lineitem").filter(F.col("l_quantity") > 45).select("l_orderkey")
    assert has_pushed_filters(df, "l_quantity")


def test_column_pruning(spark, sf_dir):
    df = ql_group_agg(spark, sf_dir)
    cols = set(scan_read_schema(df))
    # only the columns the aggregation needs — not all 11 lineitem columns
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"} <= cols


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = ql_join_inner(spark, sf_dir)
    # customer, nation, region broadcast; orders side may SMJ/SHJ
    assert broadcast_join_count(df) >= 3


def test_topk_no_global_sort(spark, sf_dir):
    df = ql_order_limit(spark, sf_dir)
    # TakeOrderedAndProject = bounded heap, not a full range-shuffle sort
    from ytsaurus_spark.plans import formatted_plan

    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_group_agg_single_shuffle(spark, sf_dir):
    df = ql_group_agg(spark, sf_dir)
    # one exchange for the groupBy (partial agg map-side), nothing else
    assert shuffle_count(df) <= 1


def test_pack_sequences_single_data_shuffle(spark, sf_dir):
    # Hierarchical prefix sum: the document stream takes exactly ONE hash
    # exchange (the __b1 window); every other exchange is over per-block /
    # per-super-block aggregates (n/4096, n/4096² rows). rangepartitioning
    # or an unpartitioned Window means the decomposition regressed into a
    # global sort.
    from ytsaurus_spark.plans import unpartitioned_window_count
    from ytsaurus_spark.queries.curation_q import curation_pack_sequences

    df = curation_pack_sequences(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert unpartitioned_window_count(df) == 0
    # 1 data exchange + aggregate-level exchanges (block sums, super-block
    # sums, top-level offsets, final bin groupBy)
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 7
    assert plan.count("BroadcastExchange") >= 2  # offsets + off2 broadcast


def test_length_buckets_no_global_window(spark, sf_dir):
    # The round-3 scale-killer: a global ntile() sorted the whole corpus
    # on one executor. The histogram decomposition must keep zero
    # unpartitioned windows and no data-scale range shuffle.
    from ytsaurus_spark.plans import unpartitioned_window_count
    from ytsaurus_spark.queries.curation_q import curation_length_buckets

    df = curation_length_buckets(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_window_count(df) == 0
    assert "rangepartitioning" not in plan
    assert "ntile" not in plan.lower()


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    # The benchmark shingle set must broadcast: a sort-merge join here
    # would shuffle the full training corpus by shingle string at 100 TB.
    from ytsaurus_spark.queries.curation_q import curation_contamination

    df = curation_contamination(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_equidepth_and_deciles_no_global_window(spark, sf_dir):
    # The equi-depth histogram and revenue deciles must use the
    # histogram + prefix_sum decomposition, never a global ntile
    # (round-3-class scale defect: one executor sorts the whole fact).
    from ytsaurus_spark.plans import unpartitioned_window_count
    from ytsaurus_spark.queries import all_queries

    qs = all_queries()
    for name in (
        "agg_histogram_equidepth",
        "analytics_customer_deciles",
        "op_sort",
    ):
        assert unpartitioned_window_count(qs[name](spark, sf_dir)) == 0, name


def test_unpartitioned_window_detector(spark):
    # The detector is the suite's central scale gate — pin all four window
    # print forms: bare global, ordered global (must count), partition-only,
    # partitioned+ordered (must not).
    from pyspark.sql import Window as W

    from ytsaurus_spark.plans import unpartitioned_window_count

    df = spark.range(10).withColumn("g", F.col("id") % 2)
    assert unpartitioned_window_count(
        df.select(F.sum("id").over(W.partitionBy()))
    ) == 1, "bare global window undetected"
    assert unpartitioned_window_count(
        df.select(F.row_number().over(W.orderBy("id")))
    ) == 1, "ordered global window undetected"
    assert unpartitioned_window_count(
        df.select(F.sum("id").over(W.partitionBy("g")))
    ) == 0, "partition-only window false positive"
    assert unpartitioned_window_count(
        df.select(F.row_number().over(W.partitionBy("g").orderBy("id")))
    ) == 0, "partitioned+ordered window false positive"


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    # Partition-pruned star join: when the fact is partitioned on the join
    # dimension, a selective dim filter must prune fact partitions at
    # RUNTIME (Spark's DPP = the reference's tablet-range routing from the
    # join key set, executor.cpp:513-622). The plan must carry a
    # dynamicpruning subquery on the fact scan's partition filters.
    li = load_tables(spark, sf_dir).read("lineitem")
    fact_path = str(tmp_path / "li_by_year")
    li.withColumn("l_year", F.year("l_shipdate")).write.partitionBy(
        "l_year"
    ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [(y, "keep" if y == 1996 else "drop") for y in range(1992, 2003)],
        "d_year int, tag string",
    )
    # DPP preconditions: the dim side carries a SELECTIVE filter and is
    # the broadcast build side (reuseBroadcastOnly default) — then the
    # fact scan's partition filters gain a dynamicpruning subquery.
    joined = (
        fact.join(
            F.broadcast(dim.filter(F.col("tag") == "keep")),
            fact.l_year == F.col("d_year"),
        )
        .groupBy("tag")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Catalyst's runtime bloom filter (runtime semi-join reduction): a
    selective filter on one shuffle-join side injects a bloom filter
    probe (`might_contain`) into the OTHER side's scan stage, cutting the
    shuffled fact rows before the exchange — the reference's analogue is
    CHYT's granule pruning plus the QL coordinator's key-range
    distribution, but this one is value-based and runtime-built. Default
    thresholds target cluster sizes (creation side >= 10 MB scans), so
    the test lowers them to fixture scale to pin that the capability is
    live in this Spark build; at 100 TB the defaults fire on their own."""
    import os

    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), "no runtime bloom filter injected"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
