"""Aggregate-function surface (SURVEY §2.1 QL aggregates + §2.3 YQL set).

QL: sum/min/max/avg/first/argmin/argmax/cardinality
(yt/yt/library/query/base/builtin_function_types.cpp:217-270, HLL at
udf/hyperloglog.cpp). YQL adds count_if/stddev/variance/corr/covar/
percentile/median/bool_and/bool_or/top freq etc.
(yql/essentials/mount/lib/yql/aggregate.yqls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytsaurus_spark.catalog import load_tables
from ytsaurus_spark.queries import register


# --- argmin/argmax → min_by/max_by (builtin_function_types.cpp:248) --------

@register(
    "agg_argmin_argmax",
    """
    SELECT l_returnflag,
           arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
           arg_max(l_orderkey, l_extendedprice) AS priciest_order,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytsaurus_spark.functions.ql import argmax, argmin

    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .groupBy("l_returnflag")
        .agg(
            argmin(F.col("l_orderkey"), F.col("l_extendedprice")).alias(
                "cheapest_order"
            ),
            argmax(F.col("l_orderkey"), F.col("l_extendedprice")).alias(
                "priciest_order"
            ),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


# --- exact count distinct (the reference's cardinality() is HLL; the exact
#     path in QL is sum over grouped subquery — here both are native) -------

@register(
    "agg_count_distinct",
    """
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- cardinality() = HyperLogLog estimate (udf/hyperloglog.cpp).
# HLL estimates differ across implementations, so the hash-checkable fact is
# the tolerance: the Spark side returns whether its sketch lands within 2% of
# exact, and the oracle asserts the same invariant trivially holds. ---------

@register(
    "agg_cardinality_hll",
    """
    SELECT (count(DISTINCT l_partkey) >= 0) AS within_tolerance
    FROM lineitem
    """,
)
def agg_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytsaurus_spark.functions.ql import cardinality

    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    est = li.agg(
        cardinality(F.col("l_partkey")).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    return est.select(
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= 0.05 * F.col("exact")
        ).alias("within_tolerance")
    )


# --- statistical aggregates (YQL stddev/variance/corr/covar) ---------------

@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)  AS sd_qty,
           round(var_samp(l_quantity), 4)     AS var_qty,
           round(stddev_pop(l_discount), 4)   AS sdp_disc,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qe,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qe
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.stddev_pop("l_discount"), 4).alias("sdp_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qe"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qe"),
        )
    )


# --- percentile / median (YQL TDigest → exact percentile here; Spark's
#     percentile() is exact-distributed, DuckDB quantile_cont matches) ------

@register(
    "agg_percentile",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        )
    )


# --- count_if / bool_and / bool_or (YQL aggregate.yqls) --------------------

@register(
    "agg_count_if_bool",
    """
    SELECT l_linestatus,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
           bool_and(l_quantity > 0)  AS all_pos,
           bool_or(l_quantity > 49)  AS any_big
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_count_if_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_disc"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
            F.bool_or(F.col("l_quantity") > 49).alias("any_big"),
        )
    )


# --- collect_list/collect_set (AGGREGATE_LIST / SetUnion) — order-free
#     projections (sizes + extrema) so the hash compare is deterministic ----

@register(
    "agg_collect",
    """
    SELECT c_nationkey,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           min(c_mktsegment) AS first_seg,
           max(c_mktsegment) AS last_seg
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("customer")
        .groupBy("c_nationkey")
        .agg(
            F.size(F.collect_set("c_mktsegment")).cast("long").alias("n_segments"),
            F.array_min(F.collect_set("c_mktsegment")).alias("first_seg"),
            F.array_max(F.collect_set("c_mktsegment")).alias("last_seg"),
        )
    )


# --- GROUP BY ROLLUP / CUBE / GROUPING SETS (sql_group_by.cpp:88-174) ------

@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_suppkey, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_suppkey, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
        """
    )


# --- histogram (YQL linear histogram) → width_bucket + group --------------

@register(
    "agg_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- dict_sum (builtin_function_types.cpp:270): element-wise map-value sum.
#     Expressed as explode → sum — the scalable shape (no driver loop). -----

@register(
    "agg_dict_sum",
    # fixture props are single-key JSON objects; the oracle extracts the
    # key/value by regexp (DuckDB build here lacks the json extension)
    """
    SELECT regexp_extract(props, '"([^"]+)"', 1) AS k,
           CAST(sum(CAST(regexp_extract(props, ': *(-?[0-9]+)', 1) AS BIGINT))
                AS BIGINT) AS total
    FROM events
    GROUP BY 1
    """,
)
def agg_dict_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    ev = cat.read("events")
    kv = ev.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,bigint>")
        ).alias("k", "v")
    )
    return kv.groupBy("k").agg(F.sum("v").alias("total"))


# --- bit aggregates (YQL bit_and/bit_or/bit_xor, aggregate.yqls) -----------

@register(
    "agg_bit_ops",
    """
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS INT) AS band,
           CAST(bit_or(l_linenumber)  AS INT) AS bor,
           CAST(bit_xor(l_linenumber) AS INT) AS bxor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("band"),
            F.bit_or("l_linenumber").alias("bor"),
            F.bit_xor("l_linenumber").alias("bxor"),
        )
    )


# --- sum_if / avg_if / some (YQL conditional-aggregate variants,
# yql/essentials/mount/lib/yql/aggregate.yqls) ------------------------------

@register(
    "agg_if_variants",
    """
    SELECT c_mktsegment,
           CAST(sum(CASE WHEN c_acctbal > 0
                         THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS BIGINT) / 100.0
             AS pos_sum,
           CAST(floor(CAST(sum(CASE WHEN c_acctbal > 0
                                    THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS BIGINT)
                      * 10000.0
                      / count(CASE WHEN c_acctbal > 0 THEN 1 END) + 0.5)
                AS BIGINT) / 1000000.0 AS pos_avg,
           CAST(count(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT) AS n_neg,
           min(upper(c_mktsegment)) AS seg_some
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def agg_if_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YQL SUM_IF / AVG_IF / COUNT_IF / SOME (aggregate.yqls): the _if
    variants are conditional folds — one pass, a CASE inside the aggregate,
    never a second filtered scan. SOME picks an arbitrary group member
    (any_value); it is only hash-stable on a functionally-dependent column,
    so the oracle pins it with the group key itself (the reference makes
    the same determinism caveat — SOME is free to pick any value)."""
    cat = load_tables(spark, sf_dir)
    cust = cat.read("customer")
    pos_c = F.when(
        F.col("c_acctbal") > 0, F.round(F.col("c_acctbal") * 100).cast("long")
    )
    pos_n = F.count(F.when(F.col("c_acctbal") > 0, 1))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            (F.sum(pos_c).cast("long") / 100.0).alias("pos_sum"),
            (
                F.floor(F.sum(pos_c).cast("long") * 10000.0 / pos_n + 0.5).cast(
                    "long"
                )
                / 1000000.0
            ).alias("pos_avg"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).cast("long").alias("n_neg"),
            F.any_value(F.upper("c_mktsegment")).alias("seg_some"),
        )
        .orderBy("c_mktsegment")
    )


# --- mode / topfreq (YQL Top/TopFreq/Mode): most frequent values per group.
# Expressed as count + ranked window — the exact-count form; the sketch form
# at 100 TB swaps the count for a count-min/space-saving summary, same shape.

@register(
    "agg_topfreq",
    """
    WITH counts AS (
      SELECT l_linestatus, l_returnflag, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_linestatus, l_returnflag
    ), ranked AS (
      SELECT l_linestatus, l_returnflag, cnt,
             CAST(row_number() OVER (PARTITION BY l_linestatus
                  ORDER BY cnt DESC, l_returnflag) AS INT) AS rnk
      FROM counts
    )
    SELECT l_linestatus, l_returnflag, cnt, rnk
    FROM ranked WHERE rnk <= 2
    """,
)
def agg_topfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cat = load_tables(spark, sf_dir)
    counts = (
        cat.read("lineitem")
        .groupBy("l_linestatus", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("l_linestatus").orderBy(
        F.col("cnt").desc(), F.col("l_returnflag")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("l_linestatus", "l_returnflag", "cnt", "rnk")
    )


# --- multiple DISTINCT aggregates in one GROUP BY --------------------------

@register(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT)  AS n_part,
           round(sum(DISTINCT l_quantity), 2)         AS sum_dq
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return (
        cat.read("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_dq"),
        )
    )


# --- WITH TOTALS AFTER HAVING (ETotalsMode::AfterHaving,
#     query_common.h:78-82): totals row aggregates only the groups that
#     survive HAVING — re-aggregated from the surviving group rows ---------

@register(
    "ql_with_totals_after_having",
    """
    WITH groups AS (
      SELECT l_suppkey, round(sum(l_quantity), 2) AS qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_suppkey
      HAVING sum(l_quantity) > 10000
    )
    SELECT l_suppkey, qty, n FROM groups
    UNION ALL
    SELECT NULL AS l_suppkey, round(sum(qty), 2) AS qty,
           CAST(sum(n) AS BIGINT) AS n
    FROM groups
    """,
)
def ql_with_totals_after_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    groups = (
        cat.read("lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").alias("_raw"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("_raw") > 10000)
        .select("l_suppkey", F.round("_raw", 2).alias("qty"), "n")
    )
    totals = groups.agg(
        F.round(F.sum("qty"), 2).alias("qty"), F.sum("n").alias("n")
    ).select(F.lit(None).cast("bigint").alias("l_suppkey"), "qty", "n")
    return groups.unionByName(totals)


# --- top / bottom k values as lists (YQL Top/Bottom, aggregate.yqls) -------

@register(
    "agg_top_bottom",
    """
    SELECT o_orderstatus,
           array_to_string(list_sort(list(o_totalprice))[1:3], ',')  AS bottom3,
           array_to_string(list_reverse_sort(list(o_totalprice))[1:3], ',') AS top3
    FROM (SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
          FROM orders)
    GROUP BY o_orderstatus
    """,
)
def agg_top_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    # DECIMAL keeps the string rendering identical across engines
    base = cat.read("orders").select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    asc = F.slice(F.array_sort(F.collect_list("o_totalprice")), 1, 3)
    desc = F.slice(F.reverse(F.array_sort(F.collect_list("o_totalprice"))), 1, 3)
    return base.groupBy("o_orderstatus").agg(
        F.array_join(asc, ",").alias("bottom3"),
        F.array_join(desc, ",").alias("top3"),
    )


# --- equi-depth histogram (YQL adaptive histogram analog) ------------------

@register(
    "agg_histogram_equidepth",
    """
    WITH h AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS p_tt,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT p_tt, c,
             CAST(COALESCE(SUM(c) OVER (ORDER BY p_tt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c_lt
      FROM h
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h)
    SELECT CAST((8 * c_lt) // n + 1 AS INT) AS bucket,
           CAST(sum(c) AS BIGINT) AS n,
           round(min(p_tt) / 100.0, 2) AS lo,
           round(max(p_tt) / 100.0, 2) AS hi
    FROM cum, tot GROUP BY 1
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram WITHOUT a global ntile: a
    global `ntile(8) OVER (ORDER BY price)` sorts the whole fact on one
    executor. Instead the bucket comes from the price HISTOGRAM — one
    partial-agg'd groupBy on exact cents, a hierarchical `prefix_sum`
    for cumulative counts (block-partitioned windows only), and
    `bucket = (k * rows_strictly_cheaper) div n + 1` assigned on
    histogram rows. Ties share a bucket (the statistically meaningful
    equi-depth definition); the oracle mirrors the same formula."""
    from ytsaurus_spark.operators.curation import prefix_sum

    cat = load_tables(spark, sf_dir)
    h = (
        cat.read("orders")
        .groupBy(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("p_tt")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    cum = prefix_sum(h, "p_tt", "__c", "c_lt")
    tot = h.agg(F.sum("__c").cast("long").alias("n_total"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(
            (F.expr("(8 * c_lt) div n_total") + 1).cast("int").alias("bucket")
        )
        .agg(
            F.sum("__c").cast("long").alias("n"),
            F.round(F.min("p_tt") / 100.0, 2).alias("lo"),
            F.round(F.max("p_tt") / 100.0, 2).alias("hi"),
        )
    )


# --- ordered string aggregation (AGGREGATE_LIST + join; listagg) ----------

@register(
    "agg_string_agg",
    """
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment, c_custkey)
             AS segs
    FROM customer WHERE c_custkey <= 50
    GROUP BY c_nationkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    # deterministic ordered concat via sorted collect_list (portable form of
    # listagg ... WITHIN GROUP)
    return (
        cat.read("customer")
        .filter(F.col("c_custkey") <= 50)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(c_mktsegment, "
                    "c_custkey))), x -> x.c_mktsegment)"
                ),
                ",",
            ).alias("segs")
        )
    )


# --- higher moments: skewness / kurtosis (YQL Stat UDF module) -------------
# Spark computes POPULATION g1 / excess g2; DuckDB's skewness() is the
# sample-adjusted G1, so the oracle spells out the population formula.

@register(
    "agg_moments",
    """
    WITH m AS (SELECT avg(l_quantity) AS mu FROM lineitem)
    SELECT round(avg(pow(l_quantity - mu, 3)) / pow(stddev_pop(l_quantity), 3), 6)
             AS skew,
           round(kurtosis_pop(l_quantity), 6) AS kurt
    FROM lineitem, m
    GROUP BY mu
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    return cat.read("lineitem").agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt"),
    )


# --- ANSI empty-input ROLLUP/CUBE compatibility ----------------------------

def ansi_rollup(df: DataFrame, group_cols: list[str], aggs) -> DataFrame:
    """ROLLUP with ANSI empty-input semantics.

    Spark's ``rollup()`` emits ZERO rows over an empty input; ANSI (and
    DuckDB, and the reference's YQL) emit the grand-total row (count 0,
    sums NULL). This helper makes the divergence opt-in compatible: it
    unions the global aggregate — which Spark *does* emit on empty input
    — but only when the rollup produced nothing, via a left-anti join
    against a 1-row marker of the rollup output. Fully declarative (no
    driver-side emptiness check); on non-empty input the fallback branch
    is provably empty and the plan is the plain rollup plus a LIMIT-1
    subplan. ``aggs`` is a list of aliased aggregate Columns usable in
    both ``rollup().agg`` and global ``agg``.
    """
    roll = df.rollup(*group_cols).agg(*aggs)
    null_keys = [
        F.lit(None).cast(df.schema[c].dataType).alias(c) for c in group_cols
    ]
    grand = df.agg(*aggs).select(*null_keys, "*")
    marker = roll.select(F.lit(1).alias("__nonempty")).limit(1)
    fallback = (
        grand.withColumn("__nonempty", F.lit(1))
        .join(marker, "__nonempty", "left_anti")
        .drop("__nonempty")
    )
    return roll.unionByName(fallback)


# --- mergeable KMV cardinality sketch (explicit-state HLL counterpart) -----

@register(
    "agg_kmv_distinct",
    """
    WITH words AS (
      SELECT DISTINCT lang AS g,
             ('0x' || substr(md5(word), 1, 8))::BIGINT AS h
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
    ), topk AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM words
    ), sk AS (
      SELECT g, count(*) AS n, max(h) AS hk FROM topk WHERE rn <= 64 GROUP BY g
    ), ex AS (
      SELECT g, CAST(count(*) AS BIGINT) AS exact FROM words GROUP BY g
    )
    SELECT sk.g AS lang,
           CAST(CASE WHEN sk.n < 64 THEN sk.n
                ELSE round(63.0 * 4294967296.0 / sk.hk, 0) END AS BIGINT) AS est,
           ex.exact AS exact
    FROM sk JOIN ex ON sk.g = ex.g
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct words per language via an EXPLICIT-state cardinality
    sketch (operators/sketches.py KMV) next to the exact count — the
    mergeable counterpart of `agg_cardinality_hll` (reference
    `cardinality`): the sketch state is a relational value, so
    cross-segment merges are ordinary aggregates. Estimate arithmetic is
    md5-exact in the oracle."""
    from ytsaurus_spark.operators.sketches import kmv_build, kmv_estimate

    cat = load_tables(spark, sf_dir)
    docs = cat.read("documents")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    )
    sk = kmv_estimate(kmv_build(words, "lang", "word", k=64), k=64)
    exact = words.groupBy("lang").agg(
        F.count_distinct(
            F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")
        ).cast("long").alias("exact")
    )
    return sk.join(exact, "lang").select(
        "lang", F.col("est"), F.col("exact")
    )


# --- KMV set algebra: segment-overlap estimation ---------------------------

@register(
    "agg_kmv_set_algebra",
    """
    WITH ha AS (
      SELECT DISTINCT year(o_orderdate) AS g,
             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ), hb AS (
      SELECT DISTINCT year(o_orderdate) AS g,
             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM orders WHERE o_orderpriority = '2-HIGH'
    ), ska AS (
      SELECT g, h FROM (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM ha) WHERE rn <= 64
    ), skb AS (
      SELECT g, h FROM (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hb) WHERE rn <= 64
    ), u AS (
      SELECT g, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        SELECT g, h, 1 AS in_a, 0 AS in_b FROM ska
        UNION ALL SELECT g, h, 0, 1 FROM skb
      ) GROUP BY g, h
    ), topk AS (
      SELECT g, h, in_a, in_b,
             row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM u
    ), agg AS (
      SELECT g, count(*) AS kk, max(h) AS hk,
             sum(in_a * in_b) AS nboth FROM topk WHERE rn <= 64 GROUP BY g
    )
    SELECT CAST(g AS INT) AS year,
      CAST(CASE WHEN kk < 64 THEN kk
           ELSE round(63.0 * 4294967296.0 / hk, 0) END AS BIGINT) AS est_union,
      CAST(CASE WHEN kk < 64 THEN nboth
           ELSE round((nboth * 1.0 / kk)
                      * round(63.0 * 4294967296.0 / hk, 0), 0)
           END AS BIGINT) AS est_intersect,
      CAST(nboth AS BIGINT) AS k_overlap
    FROM agg
    """,
)
def agg_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year OVERLAP between two customer segments (urgent-order vs
    high-order buyers) computed purely from KMV sketch states — union
    cardinality, intersection cardinality, and the raw top-k overlap
    count (operators/sketches.py:kmv_intersect_estimate, Beyer et al.
    SIGMOD'07). The point: Spark's own approx_count_distinct HLL state
    is opaque, so this set algebra is inexpressible with it — with KMV
    the sketches are rows, and combining two 100 TB segments costs a
    join of kilobyte arrays. The oracle replicates the whole pipeline
    (build → cap → union → estimate) md5-exactly."""
    from ytsaurus_spark.operators.sketches import (
        kmv_build,
        kmv_intersect_estimate,
    )

    cat = load_tables(spark, sf_dir)
    orders = cat.read("orders")
    seg = lambda pri: orders.filter(  # noqa: E731
        F.col("o_orderpriority") == pri
    ).select(F.year("o_orderdate").alias("year"), "o_custkey")
    ska = kmv_build(seg("1-URGENT"), "year", "o_custkey", k=64)
    skb = kmv_build(seg("2-HIGH"), "year", "o_custkey", k=64)
    est = kmv_intersect_estimate(ska, skb, "year", k=64)
    # project the raw overlap count, not the rounded Jaccard (the ratio's
    # 4-decimal rounding can sit on a half — integers keep the oracle
    # exact); jaccard stays available from the operator for callers.
    return est.select(
        F.col("year").cast("int").alias("year"),
        "est_union",
        "est_intersect",
        "k_overlap",
    )


# --- mergeable count-min frequency sketch -----------------------------------

@register(
    "agg_count_min_sketch",
    """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), seeds AS (
      SELECT unnest(range(4)) AS i
    ), cells AS (
      SELECT i AS row,
             (('0x' || substr(md5(i::VARCHAR || '|' || w), 1, 8))::BIGINT
              % 64) AS bucket
      FROM words CROSS JOIN seeds
    ), sk AS (
      SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row, bucket
    ), exact AS (
      SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt FROM words GROUP BY w
    ), probes AS (
      SELECT e.w, e.exact_cnt, i AS row,
             (('0x' || substr(md5(i::VARCHAR || '|' || e.w), 1, 8))::BIGINT
              % 64) AS bucket
      FROM exact e CROSS JOIN seeds
    )
    SELECT p.w AS word,
           max(p.exact_cnt) AS exact_cnt,
           CAST(min(s.cnt) AS BIGINT) AS cms_est,
           (min(s.cnt) >= max(p.exact_cnt)) AS never_underestimates
    FROM probes p JOIN sk s USING (row, bucket)
    GROUP BY p.w
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 64) over the corpus word stream,
    point-queried for every vocabulary word with the exact count joined
    alongside — the output hashes the sketch's one-sided error guarantee
    (estimate >= exact, pinned as a boolean column) together with the
    estimates themselves. The sketch is depth×width rows independent of
    stream size and merges across batches by cell-wise sum."""
    from ytsaurus_spark.operators import sketches

    cat = load_tables(spark, sf_dir)
    words = cat.read("documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    sk = sketches.count_min_build(words, "w", depth=4, width=64)
    exact = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    est = sketches.count_min_estimate(sk, exact.select("w"), "w", depth=4, width=64)
    return est.join(exact, "w").select(
        F.col("w").alias("word"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
    )


@register(
    "agg_quantile_sketch",
    """
    WITH b AS (
      SELECT CASE WHEN CAST(o_totalprice AS BIGINT) < 1 THEN -1
                  ELSE CAST(length(bin(CAST(o_totalprice AS BIGINT))) - 1
                       AS BIGINT)
             END AS bin
      FROM orders
    ), h AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bin
    ), cum AS (
      SELECT bin, c,
             CAST(SUM(c) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM h
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
    q AS (SELECT unnest([50, 90, 99]) AS q_pct)
    SELECT q_pct, bin, lo, hi, cum_count, n FROM (
      SELECT CAST(q.q_pct AS INT) AS q_pct, cum.bin,
             CAST(CASE WHEN cum.bin < 0 THEN 0
                       ELSE 1 << cum.bin END AS BIGINT) AS lo,
             CAST(CASE WHEN cum.bin < 0 THEN 1
                       ELSE 1 << (cum.bin + 1) END AS BIGINT) AS hi,
             cum.cum AS cum_count, tot.n,
             row_number() OVER (PARTITION BY q.q_pct ORDER BY cum.bin)
               AS rk
      FROM q CROSS JOIN tot JOIN cum ON cum.cum * 100 >= q.q_pct * tot.n
    ) WHERE rk = 1
    ORDER BY q_pct
    """,
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log2-binned quantile sketch over order totals
    (operators/sketches.log2_quantile_sketch): whole-bit bins (digit-
    string log2, never libm) make the sketch a ≤64-row additive
    histogram — the mergeability exact percentiles lack — and each
    quantile reports its [2^b, 2^(b+1)) bracket: the HdrHistogram /
    DDSketch trade at γ=2 so every step is integral. One partial-agged
    shuffle; quantile selection on the broadcast bin frame. The oracle
    rebuilds bins with DuckDB's bin() digit length and the same
    cum·100 >= q·n cut."""
    from ytsaurus_spark.operators.sketches import log2_quantile_sketch

    cat = load_tables(spark, sf_dir)
    # cast to BIGINT cents-free dollars: whole-dollar magnitude is the
    # sketch's natural grain here
    return log2_quantile_sketch(
        cat.read("orders"), "o_totalprice", quantiles=(50, 90, 99)
    )
