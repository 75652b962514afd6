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
    # Two-phase prefix sum: the document stream must take exactly ONE hash
    # exchange (the __blk window); a rangepartitioning or a second data
    # exchange means the prefix-sum decomposition regressed into
    # re-bucketing physical partitions.
    from ytsaurus_spark.queries.curation_q import curation_pack_sequences

    df = curation_pack_sequences(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    # data window + tiny offsets agg + offsets single-partition window +
    # final bin groupBy = 4 non-broadcast exchanges, no more
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 4
    assert plan.count("BroadcastExchange") == 1


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    # The benchmark shingle set must broadcast: a sort-merge join here
    # would shuffle the full training corpus by shingle string at 100 TB.
    from ytsaurus_spark.queries.curation_q import curation_contamination

    df = curation_contamination(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
