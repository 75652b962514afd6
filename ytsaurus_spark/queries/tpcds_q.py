"""TPC-DS-distinctive query shapes over the TPC-H-shaped fixtures.

The reference's benchmark-as-test surface is all 99 TPC-DS queries
(``yt/benchmarks/run/queries/01.sql..99.sql``, titled in ``common.py:37-42``).
The fixture here is TPC-H-shaped, so each query derives the TPC-DS star
schema from it — the DERIVATION is the contract, documented per query:

- **channel** (store_sales / catalog_sales / web_sales): the fixture has a
  single fact table, so ``l_linenumber % 3`` partitions lineitem into three
  deterministic sales channels (0=store, 1=catalog, 2=web);
- **returns** tables: lines with ``l_returnflag = 'R'``;
- **item** dims: brand = ``p_brand``, class = ``p_type``,
  category = ``substring(p_brand, 7, 1)`` (the first brand digit, 5 values),
  manufact = ``p_size % 10``;
- **date_dim**: ``year()`` / ``month()`` of the fact date column.

What each query proves (the structurally-new plan shapes on top of the
TPC-H q1–q22 suite in analytics_q.py):

- q5/q77  — multi-channel ROLLUP reports (returns LEFT JOINed per channel);
- q14     — shared-CTE INTERSECT across channels + scalar avg subquery;
- q23     — multi-step CTE chain (frequent items ∩ best customers);
- q33/q56 — three per-channel aggregates UNION ALLed then re-aggregated;
- q47/q57 — windowed year-over-year deviation ranking (avg-over-partition
            + rank + lag/lead on a monthly aggregate).

All are pure DataFrame plans: Catalyst handles CTE dedup, the INTERSECT
becomes a shuffled distinct-join, per-channel branches share one scan via
exchange reuse, and the YoY windows partition on (dim, dim) — never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ytsaurus_spark.catalog import load_tables
from ytsaurus_spark.queries import register

# channel derivation shared by every query (see module docstring)
_CHANNEL_SQL = (
    "CASE l_linenumber % 3 WHEN 0 THEN 'store' "
    "WHEN 1 THEN 'catalog' ELSE 'web' END"
)


def _channel_col():
    return (
        F.when(F.col("l_linenumber") % 3 == 0, "store")
        .when(F.col("l_linenumber") % 3 == 1, "catalog")
        .otherwise("web")
    )


def _amt():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- TPC-DS q5 shape: per-channel sales/returns ROLLUP report --------------


@register(
    "tpcds_q5_channel_rollup",
    f"""
    WITH ch AS (
      SELECT {_CHANNEL_SQL} AS channel, p_brand AS id,
             CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice END AS s,
             CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END AS r
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT channel, id, round(sum(s), 4) AS sales,
           round(sum(r), 4) AS returned,
           CAST(count(*) AS BIGINT) AS n
    FROM ch GROUP BY ROLLUP(channel, id)
    """,
)
def tpcds_q5_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 05 (yt/benchmarks/run/queries/05.sql): sales vs returns per
    channel with ROLLUP subtotals. Returns fold in as a CASE split of the
    same scan (one fact pass), the part dim broadcasts, and ROLLUP is one
    expand+aggregate — no per-grouping rescans."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    ch = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        _channel_col().alias("channel"),
        F.col("p_brand").alias("id"),
        F.when(F.col("l_returnflag") == "R", F.lit(0.0))
        .otherwise(F.col("l_extendedprice"))
        .alias("s"),
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
        .otherwise(F.lit(0.0))
        .alias("r"),
    )
    return ch.rollup("channel", "id").agg(
        F.round(F.sum("s"), 4).alias("sales"),
        F.round(F.sum("r"), 4).alias("returned"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --- TPC-DS q14 shape: shared-CTE INTERSECT across channels ----------------


@register(
    "tpcds_q14_cross_channel",
    f"""
    WITH sales AS (
      SELECT {_CHANNEL_SQL} AS channel, p_brand AS brand, p_type AS class,
             l_extendedprice * (1 - l_discount) AS amt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) BETWEEN 1996 AND 1998
    ), cross_items AS (
      SELECT brand, class FROM sales WHERE channel = 'store'
      INTERSECT
      SELECT brand, class FROM sales WHERE channel = 'catalog'
      INTERSECT
      SELECT brand, class FROM sales WHERE channel = 'web'
    ), avg_sales AS (SELECT avg(amt) AS av FROM sales)
    SELECT channel, brand, round(sum(amt), 4) AS sales,
           CAST(count(*) AS BIGINT) AS n
    FROM sales JOIN cross_items USING (brand, class), avg_sales
    GROUP BY channel, brand, av
    HAVING sum(amt) > 25 * av
    """,
)
def tpcds_q14_cross_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 14 (queries/14.sql): items sold through ALL channels
    (INTERSECT of per-channel brand/class sets — the reference spells it
    as chained LEFT SEMI JOINs) filtered against a scalar average
    subquery. The INTERSECT inputs are projections of ONE shared scan;
    the scalar average broadcasts, never a shuffle."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    sales = (
        li.filter(F.year("l_shipdate").between(1996, 1998))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            _channel_col().alias("channel"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("class"),
            _amt().alias("amt"),
        )
    )
    pair = lambda c: sales.filter(F.col("channel") == c).select("brand", "class")  # noqa: E731
    cross_items = pair("store").intersect(pair("catalog")).intersect(pair("web"))
    avg_sales = sales.agg(F.avg("amt").alias("av"))
    return (
        sales.join(F.broadcast(cross_items), ["brand", "class"])
        .crossJoin(F.broadcast(avg_sales))
        .groupBy("channel", "brand", "av")
        .agg(
            F.round(F.sum("amt"), 4).alias("sales"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("amt").alias("__raw"),
        )
        .filter(F.col("__raw") > 25 * F.col("av"))
        .select("channel", "brand", "sales", "n")
    )


# --- TPC-DS q23 shape: frequent items ∩ best customers ---------------------


@register(
    "tpcds_q23_frequent_best",
    """
    WITH freq AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY l_partkey HAVING count(*) > 4
    ), csales AS (
      SELECT o_custkey, sum(l_extendedprice * (1 - l_discount)) AS sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ), best AS (
      SELECT o_custkey FROM csales, (SELECT max(sales) AS mx FROM csales)
      WHERE sales > 0.5 * mx
    )
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS sales
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1998 AND month(o_orderdate) <= 6
      AND l_partkey IN (SELECT l_partkey FROM freq)
      AND o_custkey IN (SELECT o_custkey FROM best)
    """,
)
def tpcds_q23_frequent_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 23 (queries/23.sql): revenue from FREQUENTLY-sold items
    bought by the BEST customers — a multi-step CTE chain where two
    independent filtered aggregates (item frequency, customer spend vs
    max) feed semi-joins on the final fact scan. Both filter sets are
    aggregate outputs (small) → broadcast LeftSemi, the max is a scalar
    broadcast; the fact table is scanned, never shuffled by key."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    freq = (
        fact.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 4)
        .select("l_partkey")
    )
    csales = fact.groupBy("o_custkey").agg(F.sum(_amt()).alias("sales"))
    mx = csales.agg(F.max("sales").alias("mx"))
    best = (
        csales.crossJoin(F.broadcast(mx))
        .filter(F.col("sales") > 0.5 * F.col("mx"))
        .select("o_custkey")
    )
    return (
        fact.filter(
            (F.year("o_orderdate") == 1998) & (F.month("o_orderdate") <= 6)
        )
        .join(F.broadcast(freq), "l_partkey", "left_semi")
        .join(F.broadcast(best), "o_custkey", "left_semi")
        .agg(F.round(F.sum(_amt()), 4).alias("sales"))
    )


# --- TPC-DS q33/q56 shape: per-channel aggregates UNION ALLed --------------


def _union_by_dim(cat, dim_col, dim_alias: str, year: int, cat_digit: str):
    """Three per-channel aggregates UNION ALLed then re-aggregated — the
    q33/q56 skeleton. Category filter on substring(p_brand, 7, 1)."""
    li, part = cat.read("lineitem"), cat.read("part")
    base = (
        li.filter(F.year("l_shipdate") == year)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.substring("p_brand", 7, 1) == cat_digit)
        .select(_channel_col().alias("channel"), dim_col.alias(dim_alias),
                _amt().alias("amt"))
    )
    per = lambda c: (  # noqa: E731
        base.filter(F.col("channel") == c)
        .groupBy(dim_alias)
        .agg(F.sum("amt").alias("total"))
    )
    return (
        per("store")
        .unionAll(per("catalog"))
        .unionAll(per("web"))
        .groupBy(dim_alias)
        .agg(F.round(F.sum("total"), 4).alias("total_sales"))
    )


_Q33_ORACLE_TMPL = """
    WITH base AS (
      SELECT {channel} AS channel, {dim} AS {alias},
             l_extendedprice * (1 - l_discount) AS amt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = {year} AND substring(p_brand, 7, 1) = '{digit}'
    ), per AS (
      SELECT {alias}, sum(amt) AS total FROM base WHERE channel = 'store'
        GROUP BY {alias}
      UNION ALL
      SELECT {alias}, sum(amt) AS total FROM base WHERE channel = 'catalog'
        GROUP BY {alias}
      UNION ALL
      SELECT {alias}, sum(amt) AS total FROM base WHERE channel = 'web'
        GROUP BY {alias}
    )
    SELECT {alias}, round(sum(total), 4) AS total_sales
    FROM per GROUP BY {alias}
    """


@register(
    "tpcds_q33_manufact_union",
    _Q33_ORACLE_TMPL.format(
        channel=_CHANNEL_SQL, dim="CAST(p_size % 10 AS INT)",
        alias="manufact", year=1997, digit="1",
    ),
)
def tpcds_q33_manufact_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 33 (queries/33.sql): total sales by manufacturer for one
    category, summed across the three channel branches. Catalyst reuses
    one exchange for the three branches; the dim join broadcasts."""
    cat = load_tables(spark, sf_dir)
    return _union_by_dim(
        cat, (F.col("p_size") % 10).cast("int"), "manufact", 1997, "1"
    )


@register(
    "tpcds_q56_class_union",
    _Q33_ORACLE_TMPL.format(
        channel=_CHANNEL_SQL, dim="p_type", alias="class", year=1998,
        digit="2",
    ),
)
def tpcds_q56_class_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 56 (queries/56.sql): the q33 skeleton at item-class
    granularity with a different category slice — the reference keeps
    both because their aggregates stress different group cardinalities."""
    cat = load_tables(spark, sf_dir)
    return _union_by_dim(cat, F.col("p_type"), "class", 1998, "2")


# --- TPC-DS q47/q57 shape: windowed year-over-year deviation ---------------


def _yoy_deviation(monthly: DataFrame, part_cols: list[str], year: int):
    """avg-over-partition + rank + lag/lead on a monthly aggregate, then
    filter months deviating >10% from their partition-year mean — the
    q47/q57 v1/v2 skeleton. Windows partition on the dimension columns
    (never global); (d_year, d_moy) is unique per partition so lag/lead
    are deterministic.

    All money flows as BIGINT ten-thousandths (``_tt``): prices carry ≤4
    decimals so the fixed-point value is exact, the >10% deviation test
    becomes pure integer arithmetic (``|10·s·n − 10·S| > S``), and the
    oracle hash cannot flake on summation-order ulps the way a
    double-avg + round() formulation does."""
    wavg = W.partitionBy(*part_cols, "d_year")
    wseq = W.partitionBy(*part_cols).orderBy("d_year", "d_moy")
    v = (
        monthly.withColumn("ysum_tt", F.sum("sum_sales_tt").over(wavg))
        .withColumn("n_y", F.count(F.lit(1)).over(wavg))
        .withColumn("rn", F.rank().over(wseq))
        .withColumn("psum_tt", F.lag("sum_sales_tt").over(wseq))
        .withColumn("nsum_tt", F.lead("sum_sales_tt").over(wseq))
    )
    dev = (
        F.abs(
            10 * F.col("sum_sales_tt") * F.col("n_y") - 10 * F.col("ysum_tt")
        )
        > F.col("ysum_tt") * F.col("n_y")
    )
    return (
        v.filter((F.col("d_year") == year) & (F.col("ysum_tt") > 0) & dev)
        .select(
            *part_cols,
            "d_year",
            "d_moy",
            "sum_sales_tt",
            F.expr("ysum_tt div n_y").alias("avg_monthly_tt"),
            "rn",
            "psum_tt",
            "nsum_tt",
        )
    )


_YOY_ORACLE_TMPL = """
    WITH monthly AS (
      SELECT {dims}, CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(month(l_shipdate) AS INT) AS d_moy,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000, 0)
                  AS BIGINT) AS sum_sales_tt
      FROM {joins}
      GROUP BY {dims}, year(l_shipdate), month(l_shipdate)
    ), v AS (
      SELECT monthly.*,
             SUM(sum_sales_tt) OVER (PARTITION BY {dims}, d_year) AS ysum_tt,
             COUNT(*) OVER (PARTITION BY {dims}, d_year) AS n_y,
             rank() OVER (PARTITION BY {dims} ORDER BY d_year, d_moy) AS rn,
             lag(sum_sales_tt) OVER
               (PARTITION BY {dims} ORDER BY d_year, d_moy) AS psum_tt,
             lead(sum_sales_tt) OVER
               (PARTITION BY {dims} ORDER BY d_year, d_moy) AS nsum_tt
      FROM monthly
    )
    SELECT {dims}, d_year, d_moy, sum_sales_tt,
           CAST(ysum_tt // n_y AS BIGINT) AS avg_monthly_tt, rn,
           psum_tt, nsum_tt
    FROM v
    WHERE d_year = {year} AND ysum_tt > 0
      AND abs(10 * sum_sales_tt * n_y - 10 * ysum_tt) > ysum_tt * n_y
    """


@register(
    "tpcds_q47_yoy_deviation",
    _YOY_ORACLE_TMPL.format(
        dims="n_name, p_brand",
        joins="lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey",
        year=1997,
    ),
)
def tpcds_q47_yoy_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 47 (queries/47.sql): months whose sales deviate >10% from
    their (supplier-nation, brand) yearly mean, with prev/next month
    context. The reference's $v1/$v2 self-join triple becomes lag/lead
    over ONE window — one shuffle on the partition dims instead of three
    re-scans of the aggregate."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    monthly = (
        li.join(F.broadcast(cat.read("part")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(cat.read("supplier")), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(cat.read("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            "p_brand",
            F.year("l_shipdate").alias("d_year"),
            F.month("l_shipdate").alias("d_moy"),
        )
        .agg(
            F.round(F.sum(_amt()) * 10000, 0)
            .cast("long")
            .alias("sum_sales_tt")
        )
    )
    return _yoy_deviation(monthly, ["n_name", "p_brand"], 1997)


@register(
    "tpcds_q57_nation_yoy",
    _YOY_ORACLE_TMPL.format(
        dims="n_name, p_type",
        joins="lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey",
        year=1998,
    ),
)
def tpcds_q57_nation_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 57 (queries/57.sql): the q47 skeleton at (customer-nation,
    item-class) granularity, reached through the orders→customer join
    path (the reference keeps the catalog twin for the same reason)."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    monthly = (
        li.join(F.broadcast(cat.read("part")), li.l_partkey == F.col("p_partkey"))
        .join(cat.read("orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(cat.read("customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.read("nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            "p_type",
            F.year("l_shipdate").alias("d_year"),
            F.month("l_shipdate").alias("d_moy"),
        )
        .agg(
            F.round(F.sum(_amt()) * 10000, 0)
            .cast("long")
            .alias("sum_sales_tt")
        )
    )
    return _yoy_deviation(monthly, ["n_name", "p_type"], 1998)


# --- TPC-DS q77 shape: per-channel profit report with returns join ---------


@register(
    "tpcds_q77_profit_report",
    f"""
    WITH s AS (
      SELECT {_CHANNEL_SQL} AS channel, p_type AS id,
             sum(l_extendedprice * (1 - l_discount)) AS sales,
             sum(l_extendedprice * (1 - l_discount)
                 - l_quantity * p_retailprice * 0.1) AS profit
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag <> 'R'
      GROUP BY 1, 2
    ), r AS (
      SELECT {_CHANNEL_SQL} AS channel, p_type AS id,
             sum(l_extendedprice) AS returned,
             sum(l_extendedprice * l_tax) AS net_loss
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2
    )
    SELECT channel, id, round(sum(sales), 4) AS sales,
           round(sum(COALESCE(returned, 0)), 4) AS returned,
           round(sum(profit - COALESCE(net_loss, 0)), 4) AS profit
    FROM s LEFT JOIN r USING (channel, id)
    GROUP BY ROLLUP(channel, id)
    """,
)
def tpcds_q77_profit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 77 (queries/77.sql): net profit per channel after returns —
    sales and returns aggregated SEPARATELY per (channel, class), LEFT
    JOINed (classes with no returns keep their sales), then ROLLUP
    subtotals. The join runs on two already-aggregated inputs (tiny), so
    the only fact-scale work is the two scans Catalyst can share."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    s = (
        joined.filter(F.col("l_returnflag") != "R")
        .groupBy(_channel_col().alias("channel"), F.col("p_type").alias("id"))
        .agg(
            F.sum(_amt()).alias("sales"),
            F.sum(
                _amt() - F.col("l_quantity") * F.col("p_retailprice") * 0.1
            ).alias("profit"),
        )
    )
    r = (
        joined.filter(F.col("l_returnflag") == "R")
        .groupBy(_channel_col().alias("channel"), F.col("p_type").alias("id"))
        .agg(
            F.sum("l_extendedprice").alias("returned"),
            F.sum(F.col("l_extendedprice") * F.col("l_tax")).alias("net_loss"),
        )
    )
    return (
        s.join(r, ["channel", "id"], "left")
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum(F.coalesce("returned", F.lit(0.0))), 4).alias(
                "returned"
            ),
            F.round(
                F.sum(F.col("profit") - F.coalesce("net_loss", F.lit(0.0))), 4
            ).alias("profit"),
        )
    )


# --- TPC-DS q51 shape: dueling cumulative windows over a FULL OUTER join ---


@register(
    "tpcds_q51_cumulative_channels",
    f"""
    WITH base AS (
      SELECT {_CHANNEL_SQL} AS channel, l_partkey AS item_sk,
             CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS d_ym,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000, 0)
                  AS BIGINT) AS s_tt
      FROM lineitem
      GROUP BY 1, 2, 3
    ), web AS (
      SELECT item_sk, d_ym,
             SUM(s_tt) OVER (PARTITION BY item_sk ORDER BY d_ym
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_tt
      FROM base WHERE channel = 'web'
    ), store AS (
      SELECT item_sk, d_ym,
             SUM(s_tt) OVER (PARTITION BY item_sk ORDER BY d_ym
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_tt
      FROM base WHERE channel = 'store'
    ), joined AS (
      SELECT COALESCE(w.item_sk, s.item_sk) AS item_sk,
             COALESCE(w.d_ym, s.d_ym) AS d_ym,
             w.cume_tt AS web_sales, s.cume_tt AS store_sales
      FROM web w FULL OUTER JOIN store s
        ON w.item_sk = s.item_sk AND w.d_ym = s.d_ym
    ), y AS (
      SELECT item_sk, d_ym, web_sales, store_sales,
             MAX(web_sales) OVER (PARTITION BY item_sk ORDER BY d_ym
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_cumulative,
             MAX(store_sales) OVER (PARTITION BY item_sk ORDER BY d_ym
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_cumulative
      FROM joined
    )
    SELECT item_sk, d_ym, web_sales, store_sales,
           web_cumulative, store_cumulative
    FROM y WHERE web_cumulative > store_cumulative
    ORDER BY item_sk, d_ym LIMIT 100
    """,
)
def tpcds_q51_cumulative_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 51 (queries/51.sql): per-item cumulative web vs store sales,
    FULL OUTER joined by (item, month), then running MAX of each side
    (gap-filling the sparser channel) and the crossover filter. Every
    window partitions on item_sk — the reference's shape with no global
    sort; money flows as BIGINT ten-thousandths so cumulative sums are
    exact across engines. FULL OUTER on two aggregated inputs is
    cell-count sized, not fact sized."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    base = li.groupBy(
        _channel_col().alias("channel"),
        F.col("l_partkey").alias("item_sk"),
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("int")
        .alias("d_ym"),
    ).agg(
        F.round(F.sum(_amt()) * 10000, 0).cast("long").alias("s_tt")
    )
    wcum = W.partitionBy("item_sk").orderBy("d_ym").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    web = (
        base.filter(F.col("channel") == "web")
        .withColumn("cume_tt", F.sum("s_tt").over(wcum))
        .select("item_sk", "d_ym", F.col("cume_tt").alias("web_sales"))
        .alias("w")
    )
    store = (
        base.filter(F.col("channel") == "store")
        .withColumn("cume_tt", F.sum("s_tt").over(wcum))
        .select(
            F.col("item_sk").alias("s_item_sk"),
            F.col("d_ym").alias("s_d_ym"),
            F.col("cume_tt").alias("store_sales"),
        )
        .alias("s")
    )
    joined = web.join(
        store,
        (F.col("w.item_sk") == F.col("s.s_item_sk"))
        & (F.col("w.d_ym") == F.col("s.s_d_ym")),
        "full_outer",
    ).select(
        F.coalesce(F.col("w.item_sk"), F.col("s.s_item_sk")).alias("item_sk"),
        F.coalesce(F.col("w.d_ym"), F.col("s.s_d_ym")).alias("d_ym"),
        "web_sales",
        "store_sales",
    )
    y = joined.select(
        "*",
        F.max("web_sales").over(wcum).alias("web_cumulative"),
        F.max("store_sales").over(wcum).alias("store_cumulative"),
    )
    return (
        y.filter(F.col("web_cumulative") > F.col("store_cumulative"))
        .orderBy("item_sk", "d_ym")
        .limit(100)
    )


# --- TPC-DS q88 shape: N independent band counts cross-joined to one row ---


def _band_count(li, lo_m: int, hi_m: int, alias: str):
    return (
        li.filter(
            (F.month("l_shipdate") >= lo_m)
            & (F.month("l_shipdate") <= hi_m)
            & (
                ((F.col("l_quantity") <= 10) & (F.col("l_discount") >= 0.05))
                | ((F.col("l_quantity") > 10) & (F.col("l_quantity") <= 30))
                | ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.03))
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias(alias))
    )


_Q88_BAND_PRED = """(
        (l_quantity <= 10 AND l_discount >= 0.05)
        OR (l_quantity > 10 AND l_quantity <= 30)
        OR (l_quantity > 30 AND l_discount <= 0.03))"""

_Q88_BANDS = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12)]


@register(
    "tpcds_q88_time_bands",
    "SELECT "
    + ", ".join(
        f"""(SELECT CAST(count(*) AS BIGINT) FROM lineitem
         WHERE month(l_shipdate) BETWEEN {lo} AND {hi}
           AND {_Q88_BAND_PRED}) AS band_{lo}_{hi}"""
        for lo, hi in _Q88_BANDS
    ),
)
def tpcds_q88_time_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 88 (queries/88.sql): N independent filtered counts (time
    bands × a 3-way demographic disjunction) cross-joined into ONE result
    row. Each band is a scan-stage count; the cross joins multiply 1-row
    aggregates (broadcast scalars), so the fact table is scanned, never
    shuffled — Catalyst shares one scan across the bands via exchange
    reuse."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    out = None
    for lo, hi in _Q88_BANDS:
        cnt = _band_count(li, lo, hi, f"band_{lo}_{hi}")
        out = cnt if out is None else out.crossJoin(F.broadcast(cnt))
    return out


# --- TPC-DS q35 shape: EXISTS across channels + demographic rollout --------


@register(
    "tpcds_q35_exists_demographics",
    f"""
    WITH ch AS (
      SELECT {_CHANNEL_SQL} AS channel, o_custkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT c_mktsegment, n_name,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(c_custkey) AS BIGINT) AS min_cust,
           CAST(max(c_custkey) AS BIGINT) AS max_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM ch WHERE o_custkey = c_custkey
                  AND channel = 'store')
      AND (EXISTS (SELECT 1 FROM ch WHERE o_custkey = c_custkey
                   AND channel = 'web')
           OR EXISTS (SELECT 1 FROM ch WHERE o_custkey = c_custkey
                      AND channel = 'catalog'))
    GROUP BY c_mktsegment, n_name
    """,
)
def tpcds_q35_exists_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 35 (queries/35.sql): customers present in the store channel
    AND at least one remote channel, rolled up by demographic attributes
    (mktsegment × nation here). The EXISTS chain compiles to left-semi
    joins on aggregated key sets; the OR of two EXISTS becomes a semi
    join against the union of the two channel key sets — no fact-side
    row explosion."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    ch = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        _channel_col().alias("channel"), "o_custkey"
    )
    store_keys = ch.filter(F.col("channel") == "store").select("o_custkey")
    remote_keys = ch.filter(
        F.col("channel").isin("web", "catalog")
    ).select("o_custkey")
    cust = cat.read("customer").join(
        F.broadcast(cat.read("nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        cust.join(
            store_keys, cust.c_custkey == store_keys.o_custkey, "left_semi"
        )
        .join(
            remote_keys, cust.c_custkey == remote_keys.o_custkey, "left_semi"
        )
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("c_custkey").cast("long").alias("min_cust"),
            F.max("c_custkey").cast("long").alias("max_cust"),
        )
    )


# --- TPC-DS q2 shape: period-over-period ratio self-join -------------------


@register(
    "tpcds_q2_period_ratio",
    f"""
    WITH monthly AS (
      SELECT CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(month(l_shipdate) AS INT) AS d_moy,
             {_CHANNEL_SQL} AS channel,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000, 0)
                  AS BIGINT) AS s_tt
      FROM lineitem
      GROUP BY 1, 2, 3
    ), merged AS (
      SELECT d_year, d_moy, CAST(SUM(s_tt) AS BIGINT) AS s_tt
      FROM monthly WHERE channel IN ('web', 'catalog')
      GROUP BY d_year, d_moy
    )
    SELECT a.d_moy AS d_moy, a.s_tt AS cur_tt, b.s_tt AS prev_tt,
           round(CAST(a.s_tt AS DOUBLE) / b.s_tt, 4) AS ratio
    FROM merged a JOIN merged b
      ON a.d_moy = b.d_moy AND a.d_year = 1997 AND b.d_year = 1996
    """,
)
def tpcds_q2_period_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 02 (queries/02.sql): combined web+catalog sales per period,
    self-joined across consecutive years on the period number to emit the
    year-over-year ratio. The self-join runs on a months-sized aggregate
    (broadcastable); division happens once on exact fixed-point inputs so
    the rounded ratio is engine-stable."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    monthly = li.groupBy(
        F.year("l_shipdate").alias("d_year"),
        F.month("l_shipdate").alias("d_moy"),
        _channel_col().alias("channel"),
    ).agg(F.round(F.sum(_amt()) * 10000, 0).cast("long").alias("s_tt"))
    merged = (
        monthly.filter(F.col("channel").isin("web", "catalog"))
        .groupBy("d_year", "d_moy")
        .agg(F.sum("s_tt").cast("long").alias("s_tt"))
    )
    a = merged.filter(F.col("d_year") == 1997).alias("a")
    b = merged.filter(F.col("d_year") == 1996).alias("b")
    return a.join(F.broadcast(b), F.col("a.d_moy") == F.col("b.d_moy")).select(
        F.col("a.d_moy").alias("d_moy"),
        F.col("a.s_tt").alias("cur_tt"),
        F.col("b.s_tt").alias("prev_tt"),
        F.round(F.col("a.s_tt").cast("double") / F.col("b.s_tt"), 4).alias(
            "ratio"
        ),
    )
