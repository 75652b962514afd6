"""TPC-DS direct coverage, part 2: the 48 queries that round 4 had only
mapped to proven plan families, now implemented directly.

Together with queries/tpcds_q.py (51 shapes) this makes all 99 queries of
the reference's benchmark surface (``yt/benchmarks/run/queries/01.sql..
99.sql``, titled in ``common.py:37-42``) directly runnable and
oracle-matched. Star-schema derivation is shared with tpcds_q.py (module
docstring there): channel = ``l_linenumber % 3`` (0=store, 1=catalog,
2=web), returns = ``l_returnflag = 'R'``, item brand/class/category/
manufact from part, date_dim = year()/month() of the fact date. Extra
derivations used here, fixed once for the whole module:

- **demographics** (cd_*/hd_*): ``c_mktsegment`` plays the categorical
  demographic, ``c_acctbal`` bands play income bands;
- **store / call center / warehouse**: supplier-side keys
  (``s_suppkey``, ``s_nationkey``) — the fixture's only "location" dims;
- **zip / city / county / state**: nation keys and names (no address
  columns in the fixture);
- **promo**: ``o_orderpriority IN ('1-URGENT','2-HIGH')`` (the orders
  attribute with promo-like selectivity);
- **time-of-day bands**: month bands, as established by tpcds_q88.

Every plan keeps the fact table on the one-scan/one-shuffle budget: dims
broadcast, conditional aggregates fuse scalar-subquery fans, windows
partition on dim keys — never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ytsaurus_spark.catalog import load_tables
from ytsaurus_spark.queries import register

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


def _fixed_avg(c: str, alias: str):
    """Cross-engine-deterministic 4-decimal average: exact integer-cent
    element sums + a single division + half-up floor — both engines
    round IDENTICAL doubles (plain round(avg(x), 4) diverges when the
    exact decimal lands on a half; bit us live on q7/q27/q63)."""
    return (
        F.floor(
            F.sum(F.round(F.col(c) * 100, 0).cast("long")).cast("long")
            * 100.0
            / F.count(F.lit(1))
            + 0.5
        ).cast("long")
        / 10000.0
    ).alias(alias)



# --- TPC-DS q3: brand revenue by year for one manufacturer, one month ------


@register(
    "tpcds_q3_brand_by_year",
    """
    SELECT year(l_shipdate) AS d_year, p_brand AS brand,
           round(sum(l_extendedprice), 4) AS sum_agg
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size % 10 = 6 AND month(l_shipdate) = 11 AND l_linenumber % 3 = 0
    GROUP BY 1, 2
    ORDER BY d_year, sum_agg DESC, brand LIMIT 100
    """,
)
def tpcds_q3_brand_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 03 (yt/benchmarks/run/queries/03.sql): store sales by brand
    and year for one manufacturer in one month. manufact := p_size % 10.
    The item dim broadcasts with both predicates pushed into it, the date
    predicate pushes into the fact scan, and the top-k is a
    TakeOrderedAndProject — never a global sort."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    return (
        li.filter((F.month("l_shipdate") == 11) & (F.col("l_linenumber") % 3 == 0))
        .join(
            F.broadcast(part.filter(F.col("p_size") % 10 == 6)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.year("l_shipdate").alias("d_year"), F.col("p_brand").alias("brand")
        )
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("sum_agg"))
        .orderBy("d_year", F.col("sum_agg").desc(), "brand")
        .limit(100)
    )


# --- TPC-DS q42: category revenue by year for one month ---------------------


@register(
    "tpcds_q42_category_month",
    """
    SELECT year(l_shipdate) AS d_year, substring(p_brand, 7, 1) AS category,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_sales
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE month(l_shipdate) = 12 AND l_linenumber % 3 = 0
    GROUP BY 1, 2
    ORDER BY sum_sales DESC, d_year, category LIMIT 100
    """,
)
def tpcds_q42_category_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 42 (queries/42.sql): store sales per item category for one
    month across years. category := first brand digit (tpcds_q.py
    derivation). Same dim-filtered-aggregate family as q3 — one broadcast
    join, one partial+final aggregate, distributed top-k."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    return (
        li.filter((F.month("l_shipdate") == 12) & (F.col("l_linenumber") % 3 == 0))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").alias("d_year"),
            F.substring("p_brand", 7, 1).alias("category"),
        )
        .agg(F.round(F.sum(_amt()), 4).alias("sum_sales"))
        .orderBy(F.col("sum_sales").desc(), "d_year", "category")
        .limit(100)
    )


# --- TPC-DS q52: brand revenue for one month --------------------------------


@register(
    "tpcds_q52_brand_month",
    """
    SELECT year(l_shipdate) AS d_year, p_brand AS brand,
           round(sum(l_extendedprice), 4) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE month(l_shipdate) = 11 AND l_linenumber % 3 = 0
    GROUP BY 1, 2
    ORDER BY d_year, ext_price DESC, brand LIMIT 100
    """,
)
def tpcds_q52_brand_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 52 (queries/52.sql): q3 without the manufacturer gate —
    brand revenue leaderboard for one month. Kept as its own entry
    because the reference ships it as a distinct benchmark query."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    return (
        li.filter((F.month("l_shipdate") == 11) & (F.col("l_linenumber") % 3 == 0))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").alias("d_year"), F.col("p_brand").alias("brand")
        )
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("ext_price"))
        .orderBy("d_year", F.col("ext_price").desc(), "brand")
        .limit(100)
    )


# --- TPC-DS q55: brand revenue for one manager, one month -------------------


@register(
    "tpcds_q55_manager_brands",
    """
    SELECT p_brand AS brand, round(sum(l_extendedprice), 4) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size % 10 = 3 AND month(l_shipdate) = 11 AND l_linenumber % 3 = 0
    GROUP BY 1
    ORDER BY ext_price DESC, brand LIMIT 100
    """,
)
def tpcds_q55_manager_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 55 (queries/55.sql): brand revenue under one manager for one
    month. manager := manufact (p_size % 10) — the fixture's only
    item-side management hierarchy. Dim-filtered aggregate + top-k."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    return (
        li.filter((F.month("l_shipdate") == 11) & (F.col("l_linenumber") % 3 == 0))
        .join(
            F.broadcast(part.filter(F.col("p_size") % 10 == 3)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "brand")
        .limit(100)
    )


# --- TPC-DS q7: demographic-filtered per-item averages ----------------------


@register(
    "tpcds_q7_demographic_avgs",
    """
    SELECT p_name AS item,
           CAST(floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg1,
           CAST(floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg2,
           CAST(floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg3,
           CAST(floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg4
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND l_linenumber % 3 = 0
    GROUP BY 1 ORDER BY item LIMIT 100
    """,
)
def tpcds_q7_demographic_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 07 (queries/07.sql): four per-item averages for store sales
    to one demographic slice under promotion. demographic :=
    c_mktsegment, promo := urgent/high order priority (module
    derivations). The demographic dim is filtered BEFORE the broadcast,
    so the fact join fans in, never out. Averages are exact integer-cent
    sums divided once, so both engines perform the IDENTICAL float
    division and 4-digit rounding can't straddle a half-way ulp."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    cust, part = cat.read("customer"), cat.read("part")
    return (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .join(
            orders.filter(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_name").alias("item"))
        .agg(*[
            _fixed_avg(c, a)
            for c, a in [
                ("l_quantity", "agg1"),
                ("o_totalprice", "agg2"),
                ("l_discount", "agg3"),
                ("l_extendedprice", "agg4"),
            ]
        ])
        .orderBy("item")
        .limit(100)
    )


# --- TPC-DS q26: catalog-channel demographic averages -----------------------


@register(
    "tpcds_q26_catalog_avgs",
    """
    SELECT p_name AS item,
           round(avg(l_quantity), 4)      AS agg1,
           round(avg(o_totalprice), 4)    AS agg2,
           round(avg(l_discount), 4)      AS agg3,
           round(avg(l_extendedprice), 4) AS agg4
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'AUTOMOBILE' AND l_linenumber % 3 = 1
    GROUP BY 1 ORDER BY item LIMIT 100
    """,
)
def tpcds_q26_catalog_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 26 (queries/26.sql): the catalog-channel sibling of q7 —
    same four averages, catalog lines, a different demographic gate, no
    promo gate. Same broadcast-in plan."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    cust, part = cat.read("customer"), cat.read("part")
    return (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "AUTOMOBILE")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_name").alias("item"))
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("agg1"),
            F.round(F.avg("o_totalprice"), 4).alias("agg2"),
            F.round(F.avg("l_discount"), 4).alias("agg3"),
            F.round(F.avg("l_extendedprice"), 4).alias("agg4"),
        )
        .orderBy("item")
        .limit(100)
    )


# --- TPC-DS q91: call-center return losses by demographic -------------------


@register(
    "tpcds_q91_callcenter_losses",
    """
    SELECT o_orderpriority AS call_center,
           year(l_shipdate) AS y, month(l_shipdate) AS m,
           round(sum(l_extendedprice), 4) AS returns_loss
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R' AND l_linenumber % 3 = 1
      AND c_mktsegment IN ('HOUSEHOLD', 'MACHINERY')
    GROUP BY 1, 2, 3
    ORDER BY returns_loss DESC, call_center, y, m LIMIT 100
    """,
)
def tpcds_q91_callcenter_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 91 (queries/91.sql): catalog-return losses per call center
    and month for a demographic slice. call_center := o_orderpriority
    (the order-side categorical with call-center-like cardinality).
    Returns gate + channel gate prune the fact scan; one aggregate."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 3 == 1))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                cust.filter(F.col("c_mktsegment").isin("HOUSEHOLD", "MACHINERY"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("call_center"),
            F.year("l_shipdate").alias("y"),
            F.month("l_shipdate").alias("m"),
        )
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("returns_loss"))
        .orderBy(F.col("returns_loss").desc(), "call_center", "y", "m")
        .limit(100)
    )


# --- TPC-DS q84: customer directory lookup -----------------------------------


@register(
    "tpcds_q84_customer_lookup",
    """
    SELECT c_custkey AS customer_id,
           c_name || ',' || n_name AS customername
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 2 AND c_acctbal BETWEEN 1000 AND 5000
    ORDER BY customer_id LIMIT 100
    """,
)
def tpcds_q84_customer_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 84 (queries/84.sql): directory-style customer lookup — name
    concat for customers in one city with an income band. city := nation
    in region 2, income band := c_acctbal range. Pure dim pipeline: a
    broadcast join and a top-k, no fact table at all (matching the
    reference query, which never touches a fact)."""
    cat = load_tables(spark, sf_dir)
    cust, nation = cat.read("customer"), cat.read("nation")
    return (
        cust.filter(F.col("c_acctbal").between(1000, 5000))
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 2)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.concat_ws(",", "c_name", "n_name").alias("customername"),
        )
        .orderBy("customer_id")
        .limit(100)
    )


# --- TPC-DS q90: am/pm ratio of web sales ------------------------------------


@register(
    "tpcds_q90_am_pm_ratio",
    """
    SELECT round(am.c * 1.0 / pm.c, 4) AS am_pm_ratio FROM
      (SELECT count(*) AS c FROM lineitem
       WHERE month(l_shipdate) BETWEEN 1 AND 3
         AND l_linenumber % 3 = 2 AND l_quantity BETWEEN 10 AND 30) am,
      (SELECT count(*) AS c FROM lineitem
       WHERE month(l_shipdate) BETWEEN 7 AND 9
         AND l_linenumber % 3 = 2 AND l_quantity BETWEEN 10 AND 30) pm
    """,
)
def tpcds_q90_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 90 (queries/90.sql): ratio of web sales counted in two
    time-of-day bands. time band := month band (q88 derivation). Two
    scalar counts cross-joined — broadcast 1-row multiply, and Catalyst
    reuses one exchange for both branch scans."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    base = li.filter(
        (F.col("l_linenumber") % 3 == 2) & F.col("l_quantity").between(10, 30)
    )
    am = base.filter(F.month("l_shipdate").between(1, 3)).agg(
        F.count(F.lit(1)).alias("am_c")
    )
    pm = base.filter(F.month("l_shipdate").between(7, 9)).agg(
        F.count(F.lit(1)).alias("pm_c")
    )
    return am.crossJoin(F.broadcast(pm)).select(
        F.round(F.col("am_c") * 1.0 / F.col("pm_c"), 4).alias("am_pm_ratio")
    )


# --- TPC-DS q96: single band count -------------------------------------------


@register(
    "tpcds_q96_band_count",
    """
    SELECT CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE month(l_shipdate) = 4 AND o_orderpriority = '3-MEDIUM'
      AND l_linenumber % 3 = 0
    """,
)
def tpcds_q96_band_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 96 (queries/96.sql): one filtered count of store sales in a
    time band for one household-demographic slice. band := month, slice
    := order priority. The count is a scan-stage partial aggregate —
    nothing but the final 1-row merge crosses the wire."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    return (
        li.filter((F.month("l_shipdate") == 4) & (F.col("l_linenumber") % 3 == 0))
        .join(
            orders.filter(F.col("o_orderpriority") == "3-MEDIUM"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


# --- TPC-DS q4: three-channel customer YoY growth lattice -------------------


@register(
    "tpcds_q4_three_channel_yoy",
    f"""
    WITH per AS (
      SELECT o_custkey, {_CHANNEL_SQL} AS channel,
             CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000, 0)
                  AS BIGINT) AS s_tt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    ), six AS (
      SELECT o_custkey,
        CAST(sum(CASE WHEN channel='store'   AND d_year=1996 THEN s_tt END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN channel='store'   AND d_year=1997 THEN s_tt END) AS BIGINT) AS s2,
        CAST(sum(CASE WHEN channel='catalog' AND d_year=1996 THEN s_tt END) AS BIGINT) AS c1,
        CAST(sum(CASE WHEN channel='catalog' AND d_year=1997 THEN s_tt END) AS BIGINT) AS c2,
        CAST(sum(CASE WHEN channel='web'     AND d_year=1996 THEN s_tt END) AS BIGINT) AS w1,
        CAST(sum(CASE WHEN channel='web'     AND d_year=1997 THEN s_tt END) AS BIGINT) AS w2
      FROM per GROUP BY o_custkey
    )
    SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           round(CAST(c2 AS DOUBLE) / c1, 4) AS cat_ratio
    FROM six JOIN customer ON o_custkey = c_custkey
    WHERE s1 > 0 AND c1 > 0 AND w1 > 0
      AND CAST(c2 AS DOUBLE) / c1 > CAST(s2 AS DOUBLE) / s1
      AND CAST(c2 AS DOUBLE) / c1 > CAST(w2 AS DOUBLE) / w1
    ORDER BY c_custkey LIMIT 100
    """,
)
def tpcds_q4_three_channel_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 04 (queries/04.sql): customers whose CATALOG spending grew
    faster year-over-year than BOTH their store and web spending — the
    full three-channel extension of the q11 lattice. The reference
    self-joins a year_total CTE six times; here ONE (customer, channel,
    year) aggregate pivots to six cells via conditional aggregation —
    a single fact shuffle on customer. Amounts are exact 1e-4 fixed
    point so both engines divide identical integers."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    per = (
        li.join(cat.read("orders"), li.l_orderkey == F.col("o_orderkey"))
        .filter(F.year("l_shipdate").isin(1996, 1997))
        .select(
            "o_custkey",
            _channel_col().alias("channel"),
            F.year("l_shipdate").cast("int").alias("d_year"),
            _amt().alias("amt"),
        )
    )
    # ONE customer-keyed aggregation: each (channel, year) cell's sum is a
    # conditional aggregate — same per-cell row set as the former
    # (cust, channel, year) pre-aggregate, so the rounded 1e-4 fixed-point
    # value is identical, without the second Exchange the pivot step cost.
    cell = lambda ch, y: F.round(  # noqa: E731
        F.sum(
            F.when((F.col("channel") == ch) & (F.col("d_year") == y), F.col("amt"))
        )
        * 10000,
        0,
    ).cast("long")
    six = per.groupBy("o_custkey").agg(
        cell("store", 1996).alias("s1"), cell("store", 1997).alias("s2"),
        cell("catalog", 1996).alias("c1"), cell("catalog", 1997).alias("c2"),
        cell("web", 1996).alias("w1"), cell("web", 1997).alias("w2"),
    )
    cr = F.col("c2").cast("double") / F.col("c1")
    sr = F.col("s2").cast("double") / F.col("s1")
    wr = F.col("w2").cast("double") / F.col("w1")
    cust = cat.read("customer")
    return (
        six.filter(
            (F.col("s1") > 0) & (F.col("c1") > 0) & (F.col("w1") > 0)
            & (cr > sr) & (cr > wr)
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.round(cr, 4).alias("cat_ratio"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --- TPC-DS q74: two-channel YoY on the quantity measure --------------------


@register(
    "tpcds_q74_quantity_yoy",
    f"""
    WITH per AS (
      SELECT o_custkey, {_CHANNEL_SQL} AS channel,
             CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_tt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(l_shipdate) IN (1996, 1997) AND {_CHANNEL_SQL} <> 'catalog'
      GROUP BY 1, 2, 3
    ), four AS (
      SELECT o_custkey,
        CAST(sum(CASE WHEN channel='store' AND d_year=1996 THEN q_tt END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN channel='store' AND d_year=1997 THEN q_tt END) AS BIGINT) AS s2,
        CAST(sum(CASE WHEN channel='web'   AND d_year=1996 THEN q_tt END) AS BIGINT) AS w1,
        CAST(sum(CASE WHEN channel='web'   AND d_year=1997 THEN q_tt END) AS BIGINT) AS w2
      FROM per GROUP BY o_custkey
    )
    SELECT c_name
    FROM four JOIN customer ON o_custkey = c_custkey
    WHERE s1 > 0 AND w1 > 0
      AND CAST(w2 AS DOUBLE) / w1 > CAST(s2 AS DOUBLE) / s1
    ORDER BY c_name, c_custkey LIMIT 100
    """,
)
def tpcds_q74_quantity_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 74 (queries/74.sql): the q11 lattice on the NET-PAID
    measure (here: quantity, the fixture's undiscounted measure) over
    store + web, emitting just the customer names. Same one-shuffle
    conditional-aggregation pivot."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    per = (
        li.join(cat.read("orders"), li.l_orderkey == F.col("o_orderkey"))
        .filter(F.year("l_shipdate").isin(1996, 1997))
        .filter(_channel_col() != "catalog")
        .groupBy(
            "o_custkey",
            _channel_col().alias("channel"),
            F.year("l_shipdate").cast("int").alias("d_year"),
        )
        .agg(F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).cast("long").alias("q_tt"))
    )
    cell = lambda ch, y: F.sum(  # noqa: E731
        F.when((F.col("channel") == ch) & (F.col("d_year") == y), F.col("q_tt"))
    ).cast("long")
    four = per.groupBy("o_custkey").agg(
        cell("store", 1996).alias("s1"), cell("store", 1997).alias("s2"),
        cell("web", 1996).alias("w1"), cell("web", 1997).alias("w2"),
    )
    wr = F.col("w2").cast("double") / F.col("w1")
    sr = F.col("s2").cast("double") / F.col("s1")
    cust = cat.read("customer")
    return (
        four.filter((F.col("s1") > 0) & (F.col("w1") > 0) & (wr > sr))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .orderBy("c_name", "c_custkey")
        .limit(100)
        .select("c_name")
    )


# --- TPC-DS q75: YoY decline with returns netting ---------------------------


@register(
    "tpcds_q75_yoy_decline",
    """
    WITH per AS (
      SELECT substring(p_brand, 7, 1) AS category, p_brand AS brand,
             CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN -l_quantity
                           ELSE l_quantity END) AS BIGINT) AS net_qty,
             CAST(sum(CAST(round(CASE WHEN l_returnflag = 'R'
                                THEN -l_extendedprice * 100
                                ELSE l_extendedprice * 100 END) AS BIGINT))
                  AS BIGINT) AS net_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    )
    SELECT a.category AS category, a.brand AS brand,
           b.net_qty AS prev_qty, a.net_qty AS curr_qty,
           CAST(a.net_qty - b.net_qty AS BIGINT) AS qty_diff,
           round((a.net_cents - b.net_cents) / 100.0, 4) AS amt_diff
    FROM per a JOIN per b
      ON a.category = b.category AND a.brand = b.brand
     AND a.d_year = 1997 AND b.d_year = 1996
    WHERE b.net_qty > 0 AND CAST(a.net_qty AS DOUBLE) / b.net_qty < 0.9
    ORDER BY qty_diff, category, brand LIMIT 100
    """,
)
def tpcds_q75_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 75 (queries/75.sql): brands whose returns-netted sales
    volume DROPPED >10% year-over-year. The reference UNION ALLs three
    channels each LEFT JOINed to its returns table; the fixture folds
    returns netting into conditional sums of one scan (returns =
    'R' lines, tpcds_q.py derivation), then the prior-year comparison is
    a self-join of the brand-year aggregate — brand-cardinality, so the
    join broadcasts; the fact is shuffled once."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    sign = F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
    per = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.substring("p_brand", 7, 1).alias("category"),
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("int").alias("d_year"),
        )
        .agg(
            F.sum(sign * F.col("l_quantity")).cast("long").alias("net_qty"),
            F.sum(F.round(sign * F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("net_cents"),
        )
    )
    a = per.filter(F.col("d_year") == 1997).alias("a")
    b = per.filter(F.col("d_year") == 1996).alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.category") == F.col("b.category"))
            & (F.col("a.brand") == F.col("b.brand")),
        )
        .filter(
            (F.col("b.net_qty") > 0)
            & (F.col("a.net_qty").cast("double") / F.col("b.net_qty") < 0.9)
        )
        .select(
            F.col("a.category").alias("category"),
            F.col("a.brand").alias("brand"),
            F.col("b.net_qty").alias("prev_qty"),
            F.col("a.net_qty").alias("curr_qty"),
            (F.col("a.net_qty") - F.col("b.net_qty")).cast("long").alias("qty_diff"),
            F.round((F.col("a.net_cents") - F.col("b.net_cents")) / 100.0, 4)
            .alias("amt_diff"),
        )
        .orderBy("qty_diff", "category", "brand")
        .limit(100)
    )


# --- TPC-DS q30: web high returners vs state average ------------------------


@register(
    "tpcds_q30_web_returners",
    """
    WITH ctr AS (
      SELECT o_custkey AS cust, c_nationkey AS state,
             sum(l_extendedprice) AS total
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND l_linenumber % 3 = 2
      GROUP BY o_custkey, c_nationkey
    ), avgs AS (SELECT state, avg(total) AS st_avg FROM ctr GROUP BY state)
    SELECT c_name, round(total, 4) AS total
    FROM ctr JOIN avgs USING (state)
      JOIN customer ON cust = c_custkey
    WHERE total > 1.2 * st_avg
    ORDER BY c_name, cust LIMIT 100
    """,
)
def tpcds_q30_web_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 30 (queries/30.sql): the WEB-channel sibling of q1 —
    customers whose web return total exceeds 1.2x their state's average,
    emitting customer detail columns. Same decorrelated per-state-avg
    broadcast-back shape; the channel gate prunes the fact scan."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    ctr = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 3 == 2))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("state")
        )
        .agg(F.sum("l_extendedprice").alias("total"))
    )
    avgs = ctr.groupBy("state").agg(F.avg("total").alias("st_avg"))
    return (
        ctr.join(F.broadcast(avgs), "state")
        .filter(F.col("total") > 1.2 * F.col("st_avg"))
        .join(F.broadcast(cust), F.col("cust") == cust.c_custkey)
        .orderBy("c_name", "cust")
        .limit(100)
        .select("c_name", F.round("total", 4).alias("total"))
    )


# --- TPC-DS q81: catalog high returners with customer detail ----------------


@register(
    "tpcds_q81_catalog_returners",
    """
    WITH ctr AS (
      SELECT o_custkey AS cust, c_nationkey AS state,
             sum(l_extendedprice) AS total
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND l_linenumber % 3 = 1
      GROUP BY o_custkey, c_nationkey
    ), avgs AS (SELECT state, avg(total) AS st_avg FROM ctr GROUP BY state)
    SELECT c_name, round(c_acctbal, 4) AS c_acctbal,
           CAST(state AS INT) AS state, round(total, 4) AS total
    FROM ctr JOIN avgs USING (state)
      JOIN customer ON cust = c_custkey
    WHERE total > 1.2 * st_avg
    ORDER BY c_name, cust LIMIT 100
    """,
)
def tpcds_q81_catalog_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 81 (queries/81.sql): the CATALOG-channel sibling of q1/q30
    with the wider customer-detail projection (name, balance, state).
    Identical decorrelated shape; kept distinct because the reference
    ships it as its own benchmark query."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    ctr = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 3 == 1))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("state")
        )
        .agg(F.sum("l_extendedprice").alias("total"))
    )
    avgs = ctr.groupBy("state").agg(F.avg("total").alias("st_avg"))
    return (
        ctr.join(F.broadcast(avgs), "state")
        .filter(F.col("total") > 1.2 * F.col("st_avg"))
        .join(F.broadcast(cust), F.col("cust") == cust.c_custkey)
        .orderBy("c_name", "cust")
        .limit(100)
        .select(
            "c_name",
            F.round("c_acctbal", 4).alias("c_acctbal"),
            F.col("state").cast("int").alias("state"),
            F.round("total", 4).alias("total"),
        )
    )


# --- TPC-DS q92: web excess discount amount ---------------------------------


@register(
    "tpcds_q92_web_excess_discount",
    """
    WITH web AS (
      SELECT l_partkey, l_extendedprice * l_discount AS disc_amt, l_discount
      FROM lineitem WHERE l_linenumber % 3 = 2
    ), item_avg AS (
      SELECT l_partkey AS pk, avg(l_discount) AS ad FROM web GROUP BY l_partkey
    )
    SELECT round(sum(disc_amt), 4) AS excess_discount
    FROM web JOIN item_avg ON l_partkey = pk
    WHERE l_discount > 1.3 * ad
    """,
)
def tpcds_q92_web_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 92 (queries/92.sql): total web DISCOUNT AMOUNT on rows
    whose discount exceeds 1.3x the per-item web average — the q32
    correlated-scalar shape on the web channel with the discount-amount
    measure. Decorrelated to a per-item aggregate joined back; both
    sides come from the one channel-pruned scan."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    web = li.filter(F.col("l_linenumber") % 3 == 2).select(
        "l_partkey",
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amt"),
        "l_discount",
    )
    item_avg = web.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_discount").alias("ad")
    )
    return (
        web.join(item_avg, web.l_partkey == item_avg.pk)
        .filter(F.col("l_discount") > 1.3 * F.col("ad"))
        .agg(F.round(F.sum("disc_amt"), 4).alias("excess_discount"))
    )


# --- TPC-DS q18: catalog averages over a geography ROLLUP -------------------


@register(
    "tpcds_q18_geo_rollup_avgs",
    """
    SELECT r_name AS country, n_name AS state,
           CAST(floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg1,
           CAST(floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg2,
           CAST(floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg3,
           CAST(floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg4
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE l_linenumber % 3 = 1 AND c_mktsegment = 'FURNITURE'
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def tpcds_q18_geo_rollup_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 18 (queries/18.sql): four catalog-sales averages for one
    demographic slice, subtotaled over the customer-geography hierarchy
    (country, state := region, nation). ROLLUP is one expand+aggregate
    over the dim-broadcast join; averages are exact integer-cent sums
    divided once so both engines round identical doubles."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    cust, nation, region = (
        cat.read("customer"), cat.read("nation"), cat.read("region")
    )
    base = (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "FURNITURE")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        base.select(
            F.col("r_name").alias("country"), F.col("n_name").alias("state"),
            "l_quantity", "l_extendedprice", "l_discount", "c_acctbal",
        )
        .rollup("country", "state")
        .agg(
            _fixed_avg("l_quantity", "agg1"),
            _fixed_avg("l_extendedprice", "agg2"),
            _fixed_avg("l_discount", "agg3"),
            _fixed_avg("c_acctbal", "agg4"),
        )
    )


# --- TPC-DS q22: quantity-on-hand over the product hierarchy ROLLUP ---------


@register(
    "tpcds_q22_product_rollup_qoh",
    """
    SELECT substring(p_brand, 7, 1) AS category, p_brand AS brand,
           p_type AS class,
           CAST(floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS qoh
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ROLLUP(1, 2, 3)
    """,
)
def tpcds_q22_product_rollup_qoh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 22 (queries/22.sql): average quantity on hand subtotaled
    over the item hierarchy (category > brand > class). inventory :=
    lineitem quantities (the fixture's only stock-like measure). One
    broadcast dim join + one ROLLUP aggregate; no ORDER BY so nothing
    ever leaves partial-aggregate shape until the final merge."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.substring("p_brand", 7, 1).alias("category"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("class"),
            "l_quantity",
        )
        .rollup("category", "brand", "class")
        .agg(_fixed_avg("l_quantity", "qoh"))
    )


# --- TPC-DS q27: store averages over a state/item ROLLUP --------------------


@register(
    "tpcds_q27_state_item_rollup",
    """
    SELECT p_brand AS item, n_name AS state,
           CAST(GROUPING(n_name) AS BIGINT) AS g_state,
           CAST(floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg1,
           CAST(floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg2,
           CAST(floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                      * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS agg3
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
    WHERE l_linenumber % 3 = 0 AND c_mktsegment = 'HOUSEHOLD'
    GROUP BY ROLLUP(p_brand, n_name)
    """,
)
def tpcds_q27_state_item_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 27 (queries/27.sql): store-sales averages for one
    demographic, subtotaled item-then-state, with the GROUPING() flag
    exposed the way the reference query emits g_state. Same fixed-point
    average discipline as q18."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    cust, nation, part = cat.read("customer"), cat.read("nation"), cat.read("part")
    base = (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "HOUSEHOLD")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_brand").alias("item"), F.col("n_name").alias("state"),
            "l_quantity", "l_extendedprice", "l_discount",
        )
    )
    return base.rollup("item", "state").agg(
        F.grouping("state").cast("long").alias("g_state"),
        _fixed_avg("l_quantity", "agg1"),
        _fixed_avg("l_extendedprice", "agg2"),
        _fixed_avg("l_discount", "agg3"),
    )


# --- TPC-DS q43: weekday sales pivot per store ------------------------------


@register(
    "tpcds_q43_store_weekdays",
    """
    WITH days AS (
      SELECT s_nationkey AS store,
             date_diff('day', DATE '1995-01-01', l_shipdate) % 7 AS dow,
             l_extendedprice AS amt
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linenumber % 3 = 0 AND year(l_shipdate) = 1997
    )
    SELECT store,
           round(sum(CASE WHEN dow = 0 THEN amt ELSE 0 END), 4) AS d0,
           round(sum(CASE WHEN dow = 1 THEN amt ELSE 0 END), 4) AS d1,
           round(sum(CASE WHEN dow = 2 THEN amt ELSE 0 END), 4) AS d2,
           round(sum(CASE WHEN dow = 3 THEN amt ELSE 0 END), 4) AS d3,
           round(sum(CASE WHEN dow = 4 THEN amt ELSE 0 END), 4) AS d4,
           round(sum(CASE WHEN dow = 5 THEN amt ELSE 0 END), 4) AS d5,
           round(sum(CASE WHEN dow = 6 THEN amt ELSE 0 END), 4) AS d6
    FROM days GROUP BY store ORDER BY store
    """,
)
def tpcds_q43_store_weekdays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 43 (queries/43.sql): one year of store sales pivoted into a
    weekday column per store. store := supplier nation, weekday := the
    epoch-anchored day count mod 7 (q59's engine-neutral derivation —
    no locale-dependent week function). Seven conditional sums fuse into
    ONE aggregate pass."""
    cat = load_tables(spark, sf_dir)
    li, sup = cat.read("lineitem"), cat.read("supplier")
    days = (
        li.filter((F.col("l_linenumber") % 3 == 0) & (F.year("l_shipdate") == 1997))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_nationkey").alias("store"),
            (
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.lit("1995-01-01").cast("date"),
                )
                % 7
            ).alias("dow"),
            F.col("l_extendedprice").alias("amt"),
        )
    )
    day_sum = lambda d: F.round(  # noqa: E731
        F.sum(F.when(F.col("dow") == d, F.col("amt")).otherwise(F.lit(0.0))), 4
    ).alias(f"d{d}")
    return (
        days.groupBy("store")
        .agg(*[day_sum(d) for d in range(7)])
        .orderBy("store")
    )


# --- TPC-DS q67: top-10 sales cells within category over a deep ROLLUP ------


@register(
    "tpcds_q67_category_top_cells",
    """
    WITH agg AS (
      SELECT substring(p_brand, 7, 1) AS category, p_brand AS brand,
             p_type AS class, CAST(year(l_shipdate) AS INT) AS d_year,
             CAST(month(l_shipdate) AS INT) AS d_moy,
             CAST(sum(CAST(round(l_quantity * l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sumsales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber % 3 = 0
      GROUP BY ROLLUP(1, 2, 3, 4, 5)
    )
    SELECT * FROM (
      SELECT category, brand, class, d_year, d_moy, sumsales,
             CAST(row_number() OVER (
               PARTITION BY category
               ORDER BY sumsales DESC, coalesce(brand, ''),
                        coalesce(class, ''), coalesce(d_year, -1),
                        coalesce(d_moy, -1)
             ) AS BIGINT) AS rk
      FROM agg
    ) t WHERE rk <= 10
    """,
)
def tpcds_q67_category_top_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 67 (queries/67.sql): the deep product/time ROLLUP ranked
    within category, keeping each category's top-10 cells. sumsales is
    exact integer cents so rank order can't flake on double ties; the
    ORDER BY carries a full coalesced tie-break (Spark and DuckDB
    default NULL ordering differs — coalesce removes NULLs from the sort
    keys entirely). The window partitions on category, never global, and
    its input is the ROLLUP aggregate, not the fact."""
    from ytsaurus_spark.operators import spread_scan

    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    agg = (
        # spread a single-split scan before the 6-way ROLLUP Expand — the
        # broadcast join preserves the input partitioning, so without this
        # the expanded partial aggregation runs one-core on small inputs
        spread_scan(li.filter(F.col("l_linenumber") % 3 == 0))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.substring("p_brand", 7, 1).alias("category"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("class"),
            F.year("l_shipdate").cast("int").alias("d_year"),
            F.month("l_shipdate").cast("int").alias("d_moy"),
            (F.col("l_quantity") * F.col("l_extendedprice")).alias("qp"),
        )
        .rollup("category", "brand", "class", "d_year", "d_moy")
        .agg(F.sum(F.round(F.col("qp") * 100, 0).cast("long")).cast("long").alias("sumsales"))
    )
    w = W.partitionBy("category").orderBy(
        F.col("sumsales").desc(),
        F.coalesce(F.col("brand"), F.lit("")),
        F.coalesce(F.col("class"), F.lit("")),
        F.coalesce(F.col("d_year"), F.lit(-1)),
        F.coalesce(F.col("d_moy"), F.lit(-1)),
    )
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
    )


# --- TPC-DS q86: rank-within-parent over a web ROLLUP -----------------------


@register(
    "tpcds_q86_web_rollup_rank",
    """
    WITH agg AS (
      SELECT substring(p_brand, 7, 1) AS category, p_type AS class,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total,
             CAST(GROUPING(category) + GROUPING(class) AS BIGINT) AS lochier
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber % 3 = 2
      GROUP BY ROLLUP(category, class)
    )
    SELECT category, class, total, lochier,
           CAST(row_number() OVER (
             PARTITION BY lochier, CASE WHEN lochier = 0 THEN category END
             ORDER BY total DESC, coalesce(category, ''), coalesce(class, '')
           ) AS BIGINT) AS rank_in_parent
    FROM agg
    """,
)
def tpcds_q86_web_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 86 (queries/86.sql): the q70 rank-within-parent pattern on
    WEB sales over the item hierarchy (category > class) — each class
    ranks inside its category stratum, subtotal rows rank against
    subtotal rows. Window input is the ROLLUP output (dim-scale)."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    agg = (
        li.filter(F.col("l_linenumber") % 3 == 2)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.substring("p_brand", 7, 1).alias("category"),
            F.col("p_type").alias("class"),
            _amt().alias("amt"),
        )
        .rollup("category", "class")
        .agg(
            F.round(F.sum("amt"), 4).alias("total"),
            (F.grouping("category") + F.grouping("class"))
            .cast("long")
            .alias("lochier"),
        )
    )
    w = W.partitionBy(
        "lochier", F.when(F.col("lochier") == 0, F.col("category"))
    ).orderBy(
        F.col("total").desc(),
        F.coalesce(F.col("category"), F.lit("")),
        F.coalesce(F.col("class"), F.lit("")),
    )
    return agg.select(
        "category", "class", "total", "lochier",
        F.row_number().over(w).cast("long").alias("rank_in_parent"),
    )


# --- TPC-DS q80: channel ROLLUP with netted returns and profit --------------


@register(
    "tpcds_q80_netted_channel_report",
    f"""
    WITH ch AS (
      SELECT {_CHANNEL_SQL} AS channel, p_brand AS id,
             CASE WHEN l_returnflag <> 'R'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS sales,
             CASE WHEN l_returnflag = 'R'
                  THEN l_extendedprice ELSE 0 END AS returned,
             CASE WHEN l_returnflag <> 'R'
                  THEN l_extendedprice * (1 - l_discount)
                       - l_extendedprice * l_tax
                  ELSE -l_extendedprice END AS profit
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1997
    )
    SELECT channel, id, round(sum(sales), 4) AS sales,
           round(sum(returned), 4) AS returned,
           round(sum(profit), 4) AS profit
    FROM ch GROUP BY ROLLUP(channel, id)
    """,
)
def tpcds_q80_netted_channel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 80 (queries/80.sql): the q5 channel report extended with
    RETURNS NETTING and a profit measure — sales exclude returned lines,
    returns subtract from profit, one year. cost := the tax share
    (l_tax * price), the fixture's only cost-like rate. Still ONE fact
    scan: the channel/returns split is a CASE, the ROLLUP one
    expand+aggregate."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    is_r = F.col("l_returnflag") == "R"
    ch = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            _channel_col().alias("channel"),
            F.col("p_brand").alias("id"),
            F.when(~is_r, _amt()).otherwise(F.lit(0.0)).alias("sales"),
            F.when(is_r, F.col("l_extendedprice")).otherwise(F.lit(0.0))
            .alias("returned"),
            F.when(
                ~is_r, _amt() - F.col("l_extendedprice") * F.col("l_tax")
            )
            .otherwise(-F.col("l_extendedprice"))
            .alias("profit"),
        )
    )
    return ch.rollup("channel", "id").agg(
        F.round(F.sum("sales"), 4).alias("sales"),
        F.round(F.sum("returned"), 4).alias("returned"),
        F.round(F.sum("profit"), 4).alias("profit"),
    )


# --- TPC-DS q10: active-in-store AND (catalog OR web) demographics ----------


@register(
    "tpcds_q10_channel_reach",
    """
    WITH s AS (SELECT DISTINCT o_custkey AS ck FROM orders
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_linenumber % 3 = 0 AND year(l_shipdate) = 1997),
         c AS (SELECT DISTINCT o_custkey AS ck FROM orders
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_linenumber % 3 = 1 AND year(l_shipdate) = 1997),
         w AS (SELECT DISTINCT o_custkey AS ck FROM orders
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_linenumber % 3 = 2 AND year(l_shipdate) = 1997)
    SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cnt
    FROM customer
    WHERE c_custkey IN (SELECT ck FROM s)
      AND (c_custkey IN (SELECT ck FROM c) OR c_custkey IN (SELECT ck FROM w))
    GROUP BY 1 ORDER BY seg
    """,
)
def tpcds_q10_channel_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 10 (queries/10.sql): demographic counts of customers with
    store activity AND activity in at least one direct channel — an
    EXISTS ∧ (EXISTS ∨ EXISTS) gate. The whole EXISTS lattice
    decorrelates to ONE per-customer conditional-flag aggregate (max of
    per-channel indicators) — a single fact pass and a single customer-key
    shuffle, versus three correlated probes (or three distinct-sets +
    two semi joins); the surviving flag keys broadcast into the dim."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    ch = F.col("l_linenumber") % 3
    flags = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.year("l_shipdate") == 1997)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max((ch == 0).cast("int")).alias("in_s"),
            F.max(((ch == 1) | (ch == 2)).cast("int")).alias("in_cw"),
        )
        .filter((F.col("in_s") == 1) & (F.col("in_cw") == 1))
        .select("ck")
    )
    return (
        cust.join(F.broadcast(flags), cust.c_custkey == F.col("ck"), "left_semi")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy("seg")
    )


# --- TPC-DS q69: store-only customers (NOT EXISTS other channels) -----------


@register(
    "tpcds_q69_store_only",
    """
    WITH s AS (SELECT DISTINCT o_custkey AS ck FROM orders
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_linenumber % 3 = 0 AND year(l_shipdate) = 1997),
         c AS (SELECT DISTINCT o_custkey AS ck FROM orders
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_linenumber % 3 = 1 AND year(l_shipdate) = 1997),
         w AS (SELECT DISTINCT o_custkey AS ck FROM orders
               JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_linenumber % 3 = 2 AND year(l_shipdate) = 1997)
    SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cnt
    FROM customer
    WHERE c_custkey IN (SELECT ck FROM s)
      AND c_custkey NOT IN (SELECT ck FROM c)
      AND c_custkey NOT IN (SELECT ck FROM w)
    GROUP BY 1 ORDER BY seg
    """,
)
def tpcds_q69_store_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 69 (queries/69.sql): the q10 complement — store-active
    customers with NO catalog and NO web activity, counted by
    demographic (keys are never NULL here, so anti ≡ NOT IN). Same
    single-pass conditional-flag decorrelation as q10 with the direct-
    channel flag inverted — one fact pass, one customer-key shuffle."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    ch = F.col("l_linenumber") % 3
    flags = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.year("l_shipdate") == 1997)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max((ch == 0).cast("int")).alias("in_s"),
            F.max(((ch == 1) | (ch == 2)).cast("int")).alias("in_cw"),
        )
        .filter((F.col("in_s") == 1) & (F.col("in_cw") == 0))
        .select("ck")
    )
    return (
        cust.join(F.broadcast(flags), cust.c_custkey == F.col("ck"), "left_semi")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy("seg")
    )


# --- TPC-DS q15: catalog sales by zip behind a 3-way OR gate ----------------


@register(
    "tpcds_q15_zip_or_gate",
    """
    SELECT c_nationkey AS zip,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sales
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE l_linenumber % 3 = 1
      AND (c_nationkey IN (5, 10, 15) OR c_nationkey % 5 = 0
           OR l_extendedprice > 90000)
    GROUP BY 1 ORDER BY zip
    """,
)
def tpcds_q15_zip_or_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 15 (queries/15.sql): catalog sales per zip where the row
    passes a zip-list OR state-list OR big-ticket disjunction — the
    OR spans DIM and FACT columns so it can't become a semi-join; it
    stays a scan-stage predicate after the broadcast dim join. zip/state
    := nation keys (module derivation)."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    return (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            F.col("c_nationkey").isin(5, 10, 15)
            | (F.col("c_nationkey") % 5 == 0)
            | (F.col("l_extendedprice") > 90000)
        )
        .groupBy(F.col("c_nationkey").alias("zip"))
        .agg(F.round(F.sum(_amt()), 4).alias("sales"))
        .orderBy("zip")
    )


# --- TPC-DS q16: catalog orders shipped multi-nation, return-free -----------


@register(
    "tpcds_q16_catalog_shipping",
    """
    WITH co AS (
      SELECT l_orderkey AS ok, s_nationkey AS nk, l_extendedprice AS price,
             l_returnflag AS flag, o_orderpriority AS pri
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
      WHERE l_linenumber % 3 = 1
    ), per_order AS (
      SELECT ok, count(DISTINCT nk) AS nations,
             CAST(count(CASE WHEN flag = 'R' THEN 1 END) AS BIGINT) AS rets,
             sum(price) AS total
      FROM co WHERE pri = '2-HIGH' GROUP BY ok
    )
    SELECT CAST(count(*) AS BIGINT) AS order_count,
           round(sum(total), 4) AS total_shipping_cost
    FROM per_order WHERE nations >= 2 AND rets = 0
    """,
)
def tpcds_q16_catalog_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 16 (queries/16.sql): count + cost of high-priority catalog
    orders shipped from AT LEAST TWO nations with NO returned line — the
    EXISTS-other-warehouse ∧ NOT-EXISTS-returns pair. Both EXISTS
    decorrelate into ONE order-grain aggregate (distinct-nation count +
    conditional return count), so the fact shuffles once on the order
    key instead of running two correlated probes."""
    cat = load_tables(spark, sf_dir)
    li, sup, orders = cat.read("lineitem"), cat.read("supplier"), cat.read("orders")
    co = (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.filter(F.col("o_orderpriority") == "2-HIGH"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    per_order = co.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("s_nationkey").alias("nations"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("rets"),
        F.sum("l_extendedprice").alias("total"),
    )
    return (
        per_order.filter((F.col("nations") >= 2) & (F.col("rets") == 0))
        .agg(
            F.count(F.lit(1)).cast("long").alias("order_count"),
            F.round(F.sum("total"), 4).alias("total_shipping_cost"),
        )
    )


# --- TPC-DS q94: web orders multi-supplier, return-free ---------------------


@register(
    "tpcds_q94_web_shipping",
    """
    WITH wo AS (
      SELECT l_orderkey AS ok, l_suppkey AS sk, l_extendedprice AS price,
             l_returnflag AS flag
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber % 3 = 2 AND year(o_orderdate) = 1996
    ), per_order AS (
      SELECT ok, count(DISTINCT sk) AS supps,
             CAST(count(CASE WHEN flag = 'R' THEN 1 END) AS BIGINT) AS rets,
             sum(price) AS total
      FROM wo GROUP BY ok
    )
    SELECT CAST(count(*) AS BIGINT) AS order_count,
           round(sum(total), 4) AS total_net
    FROM per_order WHERE supps >= 2 AND rets = 0
    """,
)
def tpcds_q94_web_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 94 (queries/94.sql): the q16 shape on the WEB channel for
    one year — orders touched by ≥2 suppliers and free of returns,
    rolled to one count+sum row via the same decorrelated order-grain
    aggregate."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    wo = (
        li.filter(F.col("l_linenumber") % 3 == 2)
        .join(
            orders.filter(F.year("o_orderdate") == 1996),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    per_order = wo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("supps"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("rets"),
        F.sum("l_extendedprice").alias("total"),
    )
    return (
        per_order.filter((F.col("supps") >= 2) & (F.col("rets") == 0))
        .agg(
            F.count(F.lit(1)).cast("long").alias("order_count"),
            F.round(F.sum("total"), 4).alias("total_net"),
        )
    )


# --- TPC-DS q60: per-channel category aggregates, unioned and re-agged ------


@register(
    "tpcds_q60_category_union",
    f"""
    WITH u AS (
      SELECT {_CHANNEL_SQL} AS ch, p_brand AS id,
             l_extendedprice * (1 - l_discount) AS amt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE substring(p_brand, 7, 1) = '1' AND month(l_shipdate) = 9
    ), per AS (
      SELECT id, ch, sum(amt) AS t FROM u GROUP BY id, ch
    )
    SELECT id, round(sum(t), 4) AS total
    FROM per GROUP BY id ORDER BY id
    """,
)
def tpcds_q60_category_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 60 (queries/60.sql): item totals for one category and month
    where each CHANNEL is aggregated separately and the three aggregates
    are re-aggregated — the q33/q56 family keyed on category. The oracle
    keeps the union spelling; the Spark plan folds the branches into one
    (id, channel) partial aggregate re-summed per id (the per-branch
    channel filters previously pushed into three separate fact scans —
    round-6 audit; same fold as tpcds_q.py:_union_by_dim)."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    u = (
        li.filter(F.month("l_shipdate") == 9)
        .join(
            F.broadcast(part.filter(F.substring("p_brand", 7, 1) == "1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            _channel_col().alias("ch"), F.col("p_brand").alias("id"),
            _amt().alias("amt"),
        )
    )
    return (
        u.groupBy("id", "ch")
        .agg(F.sum("amt").alias("t"))
        .groupBy("id")
        .agg(F.round(F.sum("t"), 4).alias("total"))
        .orderBy("id")
    )


# --- TPC-DS q71: brand revenue by time band across three channels -----------


@register(
    "tpcds_q71_brand_time_bands",
    f"""
    WITH u AS (
      SELECT {_CHANNEL_SQL} AS ch, p_brand AS brand,
             CAST(month(l_shipdate) AS INT) AS t,
             l_extendedprice * (1 - l_discount) AS amt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size % 10 = 7 AND year(l_shipdate) = 1997
    )
    SELECT brand, t, round(sum(amt), 4) AS total
    FROM u GROUP BY brand, t ORDER BY brand, t
    """,
)
def tpcds_q71_brand_time_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 71 (queries/71.sql): one manufacturer's brand revenue per
    time band with all three channels UNIONed — the reference unions
    three facts against a time dim; the fixture's channels share one
    fact, so the union folds into one scan grouped by (brand, band).
    band := month (q88 derivation), manufacturer := p_size % 10."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    return (
        li.filter(F.year("l_shipdate") == 1997)
        .join(
            F.broadcast(part.filter(F.col("p_size") % 10 == 7)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.month("l_shipdate").cast("int").alias("t"),
        )
        .agg(F.round(F.sum(_amt()), 4).alias("total"))
        .orderBy("brand", "t")
    )


# --- TPC-DS q73: small-basket frequent shoppers -----------------------------


@register(
    "tpcds_q73_small_baskets",
    """
    WITH per AS (
      SELECT l_orderkey AS ok, o_custkey AS ck,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber % 3 = 0
        AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      GROUP BY 1, 2 HAVING count(*) BETWEEN 1 AND 5
    )
    SELECT c_name, ok, cnt
    FROM per JOIN customer ON ck = c_custkey
    ORDER BY cnt DESC, c_name, ok LIMIT 100
    """,
)
def tpcds_q73_small_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 73 (queries/73.sql): the q34 count-band join-back with the
    SMALL basket band (1–5 items) and a different demographic gate —
    order-grain counts filtered by HAVING, then the customer dim joined
    back for display. One fact shuffle on the order key."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    per = (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .join(
            orders.filter(
                F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt").between(1, 5))
    )
    return (
        per.join(F.broadcast(cat.read("customer")), per.ck == F.col("c_custkey"))
        .orderBy(F.col("cnt").desc(), "c_name", "ok")
        .limit(100)
        .select("c_name", "ok", "cnt")
    )


# --- TPC-DS q83: three-channel return quantities joined on item -------------


@register(
    "tpcds_q83_return_shares",
    """
    WITH sr AS (SELECT l_partkey AS pk, CAST(sum(l_quantity) AS BIGINT) AS q
                FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber % 3 = 0
                GROUP BY 1),
         cr AS (SELECT l_partkey AS pk, CAST(sum(l_quantity) AS BIGINT) AS q
                FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber % 3 = 1
                GROUP BY 1),
         wr AS (SELECT l_partkey AS pk, CAST(sum(l_quantity) AS BIGINT) AS q
                FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber % 3 = 2
                GROUP BY 1)
    SELECT sr.pk AS pk, sr.q AS sret, cr.q AS cret, wr.q AS wret,
           round(sr.q * 100.0 / ((sr.q + cr.q + wr.q) / 3.0), 4) AS s_share,
           round(cr.q * 100.0 / ((sr.q + cr.q + wr.q) / 3.0), 4) AS c_share,
           round(wr.q * 100.0 / ((sr.q + cr.q + wr.q) / 3.0), 4) AS w_share
    FROM sr JOIN cr ON sr.pk = cr.pk JOIN wr ON sr.pk = wr.pk
    ORDER BY pk LIMIT 100
    """,
)
def tpcds_q83_return_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 83 (queries/83.sql): items returned in ALL three channels
    with each channel's share of the item's average return volume. The
    oracle keeps the three-CTE join spelling; the Spark plan pivots it
    into ONE per-item conditional aggregation over the returns slice
    (the per-channel modulus filters pushed into three separate scans —
    round-6 audit; the channels partition the slice, so the union is
    the whole slice). Present-in-all-three = all conditional sums
    non-null. One selective scan, one shuffle, no joins."""
    cat = load_tables(spark, sf_dir)
    li = cat.read("lineitem")
    ch = F.col("l_linenumber") % 3
    cell = lambda k: F.sum(  # noqa: E731
        F.when(ch == k, F.col("l_quantity"))
    ).cast("long")
    tot3 = (F.col("s_q") + F.col("c_q") + F.col("w_q")) / 3.0
    return (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("s_pk"))
        .agg(cell(0).alias("s_q"), cell(1).alias("c_q"), cell(2).alias("w_q"))
        .filter(
            F.col("s_q").isNotNull()
            & F.col("c_q").isNotNull()
            & F.col("w_q").isNotNull()
        )
        .select(
            F.col("s_pk").alias("pk"),
            F.col("s_q").alias("sret"),
            F.col("c_q").alias("cret"),
            F.col("w_q").alias("wret"),
            F.round(F.col("s_q") * 100.0 / tot3, 4).alias("s_share"),
            F.round(F.col("c_q") * 100.0 / tot3, 4).alias("c_share"),
            F.round(F.col("w_q") * 100.0 / tot3, 4).alias("w_share"),
        )
        .orderBy("pk")
        .limit(100)
    )


# --- TPC-DS q12: web revenue ratio-to-report within class -------------------


@register(
    "tpcds_q12_web_revenue_ratio",
    """
    WITH agg AS (
      SELECT p_type AS class, p_brand AS brand,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                  AS BIGINT) AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber % 3 = 2 AND month(l_shipdate) IN (5, 6)
      GROUP BY 1, 2
    )
    SELECT class, brand, round(t / 10000.0, 4) AS itemrevenue,
           round(t * 100.0 / sum(t) OVER (PARTITION BY class), 4)
             AS revenueratio
    FROM agg
    """,
)
def tpcds_q12_web_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 12 (queries/12.sql): each brand's share of its class's WEB
    revenue over a two-month window — the q98 ratio-to-report shape on
    the web channel. Revenue is exact 1e-4 fixed point (price×(1-disc)
    has ≤4 decimals, so the per-element round is exact) so the window
    sum and the share division are identical integers/doubles in both
    engines. The window partitions on class — never global."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    agg = (
        li.filter((F.col("l_linenumber") % 3 == 2) & F.month("l_shipdate").isin(5, 6))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("class"), F.col("p_brand").alias("brand"))
        .agg(F.sum(F.round(_amt() * 10000, 0).cast("long")).cast("long").alias("t"))
    )
    w = W.partitionBy("class")
    return agg.select(
        "class", "brand",
        F.round(F.col("t") / 10000.0, 4).alias("itemrevenue"),
        F.round(F.col("t") * 100.0 / F.sum("t").over(w), 4).alias("revenueratio"),
    )


# --- TPC-DS q20: catalog revenue ratio-to-report within class ---------------


@register(
    "tpcds_q20_catalog_revenue_ratio",
    """
    WITH agg AS (
      SELECT p_type AS class, p_brand AS brand,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                  AS BIGINT) AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber % 3 = 1 AND month(l_shipdate) IN (2, 3)
      GROUP BY 1, 2
    )
    SELECT class, brand, round(t / 10000.0, 4) AS itemrevenue,
           round(t * 100.0 / sum(t) OVER (PARTITION BY class), 4)
             AS revenueratio
    FROM agg
    """,
)
def tpcds_q20_catalog_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 20 (queries/20.sql): the q12/q98 ratio-to-report shape on
    the CATALOG channel over its own two-month window. Same exact
    fixed-point discipline and class-partitioned window."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    agg = (
        li.filter((F.col("l_linenumber") % 3 == 1) & F.month("l_shipdate").isin(2, 3))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("class"), F.col("p_brand").alias("brand"))
        .agg(F.sum(F.round(_amt() * 10000, 0).cast("long")).cast("long").alias("t"))
    )
    w = W.partitionBy("class")
    return agg.select(
        "class", "brand",
        F.round(F.col("t") / 10000.0, 4).alias("itemrevenue"),
        F.round(F.col("t") * 100.0 / F.sum("t").over(w), 4).alias("revenueratio"),
    )


# --- TPC-DS q13: three-arm demographic x quantity-band disjunction ----------


@register(
    "tpcds_q13_band_disjunction_avgs",
    """
    SELECT
      CAST(floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_qty,
      CAST(floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_price,
      round(sum(l_extendedprice * (1 - l_discount)), 4) AS total
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE l_linenumber % 3 = 0 AND (
         (c_mktsegment = 'BUILDING'   AND l_quantity BETWEEN 1  AND 20)
      OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 21 AND 35)
      OR (c_mktsegment = 'MACHINERY'  AND l_quantity BETWEEN 36 AND 50))
    """,
)
def tpcds_q13_band_disjunction_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 13 (queries/13.sql): one-row store-sales averages where
    each row must pass ONE of three (demographic, quantity-band) arm
    pairs — the cross-table OR that can't push into either side alone.
    It evaluates post-join in the scan stage; averages use the exact
    cent-sum + half-up-floor discipline (see q7)."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    arm = lambda seg, lo, hi: (  # noqa: E731
        (F.col("c_mktsegment") == seg) & F.col("l_quantity").between(lo, hi)
    )
    base = (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            arm("BUILDING", 1, 20)
            | arm("AUTOMOBILE", 21, 35)
            | arm("MACHINERY", 36, 50)
        )
    )
    return base.agg(
        _fixed_avg("l_quantity", "avg_qty"),
        _fixed_avg("l_extendedprice", "avg_price"),
        F.round(F.sum(_amt()), 4).alias("total"),
    )


# --- TPC-DS q85: web returns by reason behind a band disjunction ------------


@register(
    "tpcds_q85_return_reasons",
    """
    SELECT o_orderpriority AS reason,
      CAST(floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_qty,
      CAST(floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 * 100.0 / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_refund
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R' AND l_linenumber % 3 = 2 AND (
         (c_mktsegment = 'BUILDING'  AND c_acctbal BETWEEN 0    AND 3000)
      OR (c_mktsegment = 'FURNITURE' AND c_acctbal BETWEEN 3000 AND 6000)
      OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal BETWEEN 6000 AND 10000))
    GROUP BY 1 ORDER BY reason LIMIT 100
    """,
)
def tpcds_q85_return_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 85 (queries/85.sql): average quantity and refund of WEB
    returns per return reason, gated by a three-arm (demographic,
    income-band) disjunction — q13's OR shape plus the reason grouping.
    reason := o_orderpriority (module derivation). Exact fixed-point
    averages; the returns+channel gates prune the scan."""
    cat = load_tables(spark, sf_dir)
    li, orders, cust = cat.read("lineitem"), cat.read("orders"), cat.read("customer")
    arm = lambda seg, lo, hi: (  # noqa: E731
        (F.col("c_mktsegment") == seg) & F.col("c_acctbal").between(lo, hi)
    )
    base = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") % 3 == 2))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            arm("BUILDING", 0, 3000)
            | arm("FURNITURE", 3000, 6000)
            | arm("HOUSEHOLD", 6000, 10000)
        )
    )
    return (
        base.groupBy(F.col("o_orderpriority").alias("reason"))
        .agg(_fixed_avg("l_quantity", "avg_qty"),
             _fixed_avg("l_extendedprice", "avg_refund"))
        .orderBy("reason")
        .limit(100)
    )


# --- TPC-DS q17: sale -> return -> repurchase quantity statistics -----------


@register(
    "tpcds_q17_repurchase_stats",
    """
    WITH s AS (SELECT c_nationkey AS ck, l_partkey AS pk,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_linenumber % 3 = 0 AND l_returnflag <> 'R'
               GROUP BY 1, 2),
         r AS (SELECT c_nationkey AS ck, l_partkey AS pk,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_linenumber % 3 = 0 AND l_returnflag = 'R'
               GROUP BY 1, 2),
         c AS (SELECT c_nationkey AS ck, l_partkey AS pk,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_linenumber % 3 = 1
               GROUP BY 1, 2),
         j AS (SELECT p_brand AS brand, s.q AS sq, r.q AS rq, c.q AS cq
               FROM s JOIN r ON s.ck = r.ck AND s.pk = r.pk
                      JOIN c ON s.ck = c.ck AND s.pk = c.pk
                      JOIN part ON s.pk = p_partkey)
    SELECT brand, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(sq) AS BIGINT) AS store_qty,
      CAST(sum(rq) AS BIGINT) AS return_qty,
      CAST(sum(cq) AS BIGINT) AS catalog_qty,
      round(CASE WHEN count(*) > 1 THEN
        sqrt((count(*) * sum(sq * sq) - sum(sq) * sum(sq)) * 1.0
             / (count(*) * (count(*) - 1))) END, 4) AS store_qty_stdev
    FROM j GROUP BY brand
    """,
)
def tpcds_q17_repurchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 17 (queries/17.sql): customers who bought in store,
    returned, then repurchased by catalog — per-brand quantity counts
    and spread. chain key := (customer STATE, item): the fixture is too
    sparse for per-customer chains at test SF (empty result proves
    nothing), so the household key relaxes to the state, keeping the
    triple-join shape with a non-trivial oracle. The three fact roles
    are conditional sums of
    ONE scan grouped on (state, item) — the reference's triple fact join
    decorrelated the q14 way (each join role becomes a filtered SUM, the
    inner-join semantics a "present in all three" filter), so the fact
    is scanned once and shuffled once instead of once per role. Stddev
    is computed from exact integer sums with the explicit formula — both
    engines take sqrt of the IDENTICAL double instead of their own
    streaming-variance paths."""
    cat = load_tables(spark, sf_dir)
    li, orders, part = cat.read("lineitem"), cat.read("orders"), cat.read("part")
    cust = cat.read("customer")
    ch = F.col("l_linenumber") % 3
    is_r = F.col("l_returnflag") == "R"
    role = lambda cond: F.sum(  # noqa: E731
        F.when(cond, F.col("l_quantity"))
    ).cast("long")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("ck"), F.col("l_partkey").alias("pk")
        )
        .agg(
            role((ch == 0) & ~is_r).alias("sq"),
            role((ch == 0) & is_r).alias("rq"),
            role(ch == 1).alias("cq"),
        )
        .filter(
            F.col("sq").isNotNull()
            & F.col("rq").isNotNull()
            & F.col("cq").isNotNull()
        )
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .select(F.col("p_brand").alias("brand"), "sq", "rq", "cq")
    )
    n = F.count(F.lit(1))
    s1, s2 = F.sum("sq"), F.sum(F.col("sq") * F.col("sq"))
    return j.groupBy("brand").agg(
        n.cast("long").alias("n"),
        F.sum("sq").cast("long").alias("store_qty"),
        F.sum("rq").cast("long").alias("return_qty"),
        F.sum("cq").cast("long").alias("catalog_qty"),
        F.round(
            F.when(
                n > 1,
                F.sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1))),
            ),
            4,
        ).alias("store_qty_stdev"),
    )


# --- TPC-DS q29: sale -> return -> repurchase quantity maxima ---------------


@register(
    "tpcds_q29_repurchase_maxima",
    """
    WITH s AS (SELECT c_nationkey AS ck, l_partkey AS pk,
                      CAST(max(l_quantity) AS BIGINT) AS q
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_linenumber % 3 = 0 AND l_returnflag <> 'R'
               GROUP BY 1, 2),
         r AS (SELECT c_nationkey AS ck, l_partkey AS pk,
                      CAST(max(l_quantity) AS BIGINT) AS q
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_linenumber % 3 = 0 AND l_returnflag = 'R'
               GROUP BY 1, 2),
         c AS (SELECT c_nationkey AS ck, l_partkey AS pk,
                      CAST(max(l_quantity) AS BIGINT) AS q
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_linenumber % 3 = 1
               GROUP BY 1, 2)
    SELECT p_brand AS brand,
           CAST(max(s.q) AS BIGINT) AS store_max,
           CAST(max(r.q) AS BIGINT) AS return_max,
           CAST(max(c.q) AS BIGINT) AS catalog_max
    FROM s JOIN r ON s.ck = r.ck AND s.pk = r.pk
           JOIN c ON s.ck = c.ck AND s.pk = c.pk
           JOIN part ON s.pk = p_partkey
    GROUP BY 1
    """,
)
def tpcds_q29_repurchase_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 29 (queries/29.sql): the q17 triple-fact chain reporting
    per-brand quantity MAXIMA instead of spread — integer maxes, so no
    float discipline is needed at all. Same single-pass conditional
    aggregation as q17: one fact scan, one (state, item) shuffle."""
    cat = load_tables(spark, sf_dir)
    li, orders, part = cat.read("lineitem"), cat.read("orders"), cat.read("part")
    cust = cat.read("customer")
    ch = F.col("l_linenumber") % 3
    is_r = F.col("l_returnflag") == "R"
    role = lambda cond: F.max(  # noqa: E731
        F.when(cond, F.col("l_quantity"))
    ).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("ck"), F.col("l_partkey").alias("pk")
        )
        .agg(
            role((ch == 0) & ~is_r).alias("sq"),
            role((ch == 0) & is_r).alias("rq"),
            role(ch == 1).alias("cq"),
        )
        .filter(
            F.col("sq").isNotNull()
            & F.col("rq").isNotNull()
            & F.col("cq").isNotNull()
        )
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.max("sq").cast("long").alias("store_max"),
            F.max("rq").cast("long").alias("return_max"),
            F.max("cq").cast("long").alias("catalog_max"),
        )
    )


# --- TPC-DS q19: brand revenue where buyer and seller locations differ ------


@register(
    "tpcds_q19_cross_location_brands",
    """
    SELECT p_brand AS brand, round(sum(l_extendedprice), 4) AS ext_price
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
    WHERE l_linenumber % 3 = 0 AND month(l_shipdate) = 11
      AND c_nationkey <> s_nationkey
    GROUP BY 1 ORDER BY ext_price DESC, brand LIMIT 100
    """,
)
def tpcds_q19_cross_location_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 19 (queries/19.sql): brand revenue for store sales where the
    customer's zip differs from the store's — the location-mismatch
    residual predicate over a two-dim join (q46's family at brand
    grain). zip := nation key on both sides; both dims broadcast and the
    mismatch evaluates in the scan stage."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    cust, sup, part = cat.read("customer"), cat.read("supplier"), cat.read("part")
    return (
        li.filter((F.col("l_linenumber") % 3 == 0) & (F.month("l_shipdate") == 11))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "brand")
        .limit(100)
    )


# --- TPC-DS q68: order-grain dual sums with location mismatch ---------------


@register(
    "tpcds_q68_ticket_sums",
    """
    WITH per AS (
      SELECT l_orderkey AS ok, o_custkey AS ck, s_nationkey AS bought_nation,
             round(sum(l_extendedprice), 4) AS ext_sales,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS net_sales
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linenumber % 3 = 0
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2, 3
    )
    SELECT c_name, ok, bought_nation, ext_sales, net_sales
    FROM per JOIN customer ON ck = c_custkey
    WHERE bought_nation <> c_nationkey
    ORDER BY c_name, ok, bought_nation LIMIT 100
    """,
)
def tpcds_q68_ticket_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 68 (queries/68.sql): the q46 aggregate-to-ticket-grain
    shape emitting TWO per-ticket amount sums (list and net), for
    promo-priority orders whose purchase location differs from the
    customer's. One order-grain shuffle; the customer rejoin broadcasts
    and the mismatch filters after it."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    sup, cust = cat.read("supplier"), cat.read("customer")
    per = (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .join(
            orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("l_orderkey").alias("ok"),
            F.col("o_custkey").alias("ck"),
            F.col("s_nationkey").alias("bought_nation"),
        )
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("ext_sales"),
            F.round(F.sum(_amt()), 4).alias("net_sales"),
        )
    )
    cust = cat.read("customer")
    return (
        per.join(F.broadcast(cust), per.ck == cust.c_custkey)
        .filter(F.col("bought_nation") != F.col("c_nationkey"))
        .orderBy("c_name", "ok", "bought_nation")
        .limit(100)
        .select("c_name", "ok", "bought_nation", "ext_sales", "net_sales")
    )


# --- TPC-DS q79: per-ticket store profit for promo shoppers -----------------


@register(
    "tpcds_q79_ticket_profit",
    """
    WITH per AS (
      SELECT l_orderkey AS ok, o_custkey AS ck, s_nationkey AS store,
             round(sum(l_extendedprice * (1 - l_discount)
                       - l_extendedprice * l_tax), 4) AS profit
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linenumber % 3 = 0
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2, 3
    )
    SELECT c_name, store, ok, profit
    FROM per JOIN customer ON ck = c_custkey
    ORDER BY c_name, store, ok LIMIT 100
    """,
)
def tpcds_q79_ticket_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 79 (queries/79.sql): per-ticket store profit for one
    household-demographic slice, with customer display attributes joined
    back — the q46/q68 ticket-grain family on the PROFIT measure (cost
    := the tax share, q80's derivation). One order-grain shuffle, dims
    broadcast, distributed top-k."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    sup, cust = cat.read("supplier"), cat.read("customer")
    per = (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .join(
            orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("l_orderkey").alias("ok"),
            F.col("o_custkey").alias("ck"),
            F.col("s_nationkey").alias("store"),
        )
        .agg(
            F.round(
                F.sum(_amt() - F.col("l_extendedprice") * F.col("l_tax")), 4
            ).alias("profit")
        )
    )
    return (
        per.join(F.broadcast(cust), per.ck == cust.c_custkey)
        .orderBy("c_name", "store", "ok")
        .limit(100)
        .select("c_name", "store", "ok", "profit")
    )


# --- TPC-DS q37: catalog-sold items in a price and stock band ---------------


@register(
    "tpcds_q37_catalog_item_bands",
    """
    WITH inv AS (
      SELECT l_partkey AS pk FROM lineitem
      GROUP BY 1 HAVING sum(l_quantity) BETWEEN 200 AND 1500
    )
    SELECT p_partkey AS item, p_name AS name,
           round(p_retailprice, 4) AS price
    FROM part
      JOIN inv ON p_partkey = pk
      JOIN (SELECT DISTINCT l_partkey FROM lineitem
            WHERE l_linenumber % 3 = 1) cs ON p_partkey = cs.l_partkey
    WHERE p_retailprice BETWEEN 800 AND 1300
    ORDER BY item LIMIT 100
    """,
)
def tpcds_q37_catalog_item_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 37 (queries/37.sql): items in a retail-price band whose
    stock on hand sits in a quantity band AND that actually sold through
    the catalog channel. inventory := total lineitem quantity per item
    (q22's derivation). Both gates are item-grain aggregates semi-joined
    into the dim — the fact is scanned for aggregates only, and the
    price predicate pushes into the part scan."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    inv = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq").between(200, 1500))
        .select("pk")
    )
    cs = (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .select("l_partkey")
        .distinct()
    )
    return (
        part.filter(F.col("p_retailprice").between(800, 1300))
        .join(inv, F.col("p_partkey") == F.col("pk"), "left_semi")
        .join(cs, F.col("p_partkey") == cs.l_partkey, "left_semi")
        .select(
            F.col("p_partkey").alias("item"),
            F.col("p_name").alias("name"),
            F.round("p_retailprice", 4).alias("price"),
        )
        .orderBy("item")
        .limit(100)
    )


# --- TPC-DS q82: store-sold items in a price and stock band -----------------


@register(
    "tpcds_q82_store_item_bands",
    """
    WITH inv AS (
      SELECT l_partkey AS pk FROM lineitem
      GROUP BY 1 HAVING sum(l_quantity) BETWEEN 400 AND 900
    )
    SELECT p_partkey AS item, p_name AS name,
           round(p_retailprice, 4) AS price
    FROM part
      JOIN inv ON p_partkey = pk
      JOIN (SELECT DISTINCT l_partkey FROM lineitem
            WHERE l_linenumber % 3 = 0) ss ON p_partkey = ss.l_partkey
    WHERE p_retailprice BETWEEN 900 AND 950
    ORDER BY item LIMIT 100
    """,
)
def tpcds_q82_store_item_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 82 (queries/82.sql): the q37 shape on the STORE channel
    with its own price/stock bands. Same item-grain semi-join plan."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    inv = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq").between(400, 900))
        .select("pk")
    )
    ss = (
        li.filter(F.col("l_linenumber") % 3 == 0)
        .select("l_partkey")
        .distinct()
    )
    return (
        part.filter(F.col("p_retailprice").between(900, 950))
        .join(inv, F.col("p_partkey") == F.col("pk"), "left_semi")
        .join(ss, F.col("p_partkey") == ss.l_partkey, "left_semi")
        .select(
            F.col("p_partkey").alias("item"),
            F.col("p_name").alias("name"),
            F.round("p_retailprice", 4).alias("price"),
        )
        .orderBy("item")
        .limit(100)
    )


# --- TPC-DS q72: inventory below demand, promo split ------------------------


@register(
    "tpcds_q72_inventory_shortfall",
    """
    WITH demand AS (
      SELECT l_partkey AS pk,
             date_diff('day', DATE '1995-01-01', l_shipdate) // 7 AS wk,
             l_quantity AS dq, o_orderpriority AS pri
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber % 3 = 1
    ), inv AS (
      SELECT l_partkey AS pk,
             date_diff('day', DATE '1995-01-01', l_shipdate) // 7 AS wk,
             l_quantity AS iq
      FROM lineitem WHERE l_linenumber % 3 = 0
    )
    SELECT d.pk AS item, CAST(d.wk AS BIGINT) AS week,
           CAST(count(CASE WHEN d.pri IN ('1-URGENT', '2-HIGH') THEN 1 END)
                AS BIGINT) AS promo,
           CAST(count(CASE WHEN d.pri NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
                AS BIGINT) AS no_promo,
           CAST(count(*) AS BIGINT) AS total_cnt
    FROM demand d JOIN inv i ON d.pk = i.pk AND d.wk = i.wk AND i.iq < d.dq
    GROUP BY 1, 2
    ORDER BY total_cnt DESC, item, week LIMIT 100
    """,
)
def tpcds_q72_inventory_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 72 (queries/72.sql): catalog demand lines whose same-week
    inventory sits BELOW the demanded quantity, split promo/no-promo —
    the inventory-below-demand non-equi fact-fact join. inventory :=
    store-channel lines of the same item/week (the fixture's stock
    proxy), week := epoch-anchored day count div 7 (q59). The join is
    EQUI on (item, week) with the quantity comparison as a residual —
    so at scale it shuffles both sides once on a well-distributed
    composite key, never degenerating into a range cross-product."""
    cat = load_tables(spark, sf_dir)
    li, orders = cat.read("lineitem"), cat.read("orders")
    wk = F.expr(
        "date_diff(day, DATE'1995-01-01', cast(l_shipdate as date)) div 7"
    )
    demand = (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_partkey").alias("pk"), wk.alias("wk"),
            F.col("l_quantity").alias("dq"),
            F.col("o_orderpriority").alias("pri"),
        )
    )
    inv = li.filter(F.col("l_linenumber") % 3 == 0).select(
        F.col("l_partkey").alias("i_pk"), wk.alias("i_wk"),
        F.col("l_quantity").alias("iq"),
    )
    is_promo = F.col("pri").isin("1-URGENT", "2-HIGH")
    return (
        demand.join(
            inv,
            (F.col("pk") == F.col("i_pk"))
            & (F.col("wk") == F.col("i_wk"))
            & (F.col("iq") < F.col("dq")),
        )
        .groupBy(F.col("pk").alias("item"), F.col("wk").cast("long").alias("week"))
        .agg(
            F.count(F.when(is_promo, 1)).cast("long").alias("promo"),
            F.count(F.when(~is_promo, 1)).cast("long").alias("no_promo"),
            F.count(F.lit(1)).cast("long").alias("total_cnt"),
        )
        .orderBy(F.col("total_cnt").desc(), "item", "week")
        .limit(100)
    )


# --- TPC-DS q53: manufacturer quarterly deviation from own average ----------


@register(
    "tpcds_q53_manufact_deviation",
    """
    WITH monthly AS (
      SELECT p_size % 10 AS manufact,
             CAST(quarter(l_shipdate) AS INT) AS qtr,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                  AS BIGINT) AS s_tt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber % 3 = 0 AND year(l_shipdate) = 1997
      GROUP BY 1, 2
    ), with_avg AS (
      SELECT manufact, qtr, s_tt,
             avg(s_tt) OVER (PARTITION BY manufact) AS av
      FROM monthly
    )
    SELECT manufact, qtr, s_tt / 10000.0 AS sales,
           CAST(floor(av + 0.5) AS BIGINT) / 10000.0 AS avg_sales
    FROM with_avg
    WHERE av > 0 AND abs(s_tt - av) / av > 0.1
    ORDER BY manufact, qtr
    """,
)
def tpcds_q53_manufact_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 53 (queries/53.sql): manufacturer quarters deviating >10%
    from the manufacturer's own average — the q89 deviation family at
    manufacturer/quarter grain. Sales are exact 1e-4 fixed point so the
    partition average (integer sum / count) and the deviation test are
    identical doubles in both engines. Window partitions on manufact."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    monthly = (
        li.filter((F.col("l_linenumber") % 3 == 0) & (F.year("l_shipdate") == 1997))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            (F.col("p_size") % 10).alias("manufact"),
            F.quarter("l_shipdate").cast("int").alias("qtr"),
        )
        .agg(F.sum(F.round(_amt() * 10000, 0).cast("long")).cast("long").alias("s_tt"))
    )
    w = W.partitionBy("manufact")
    with_avg = monthly.withColumn("av", F.avg("s_tt").over(w))
    return (
        with_avg.filter(
            (F.col("av") > 0)
            & (F.abs(F.col("s_tt") - F.col("av")) / F.col("av") > 0.1)
        )
        .select(
            "manufact", "qtr",
            (F.col("s_tt") / 10000.0).alias("sales"),
            (F.floor(F.col("av") + 0.5).cast("long") / 10000.0)
            .alias("avg_sales"),
        )
        .orderBy("manufact", "qtr")
    )


# --- TPC-DS q63: class monthly deviation from own average -------------------


@register(
    "tpcds_q63_class_deviation",
    """
    WITH monthly AS (
      SELECT p_type AS class, CAST(month(l_shipdate) AS INT) AS moy,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                  AS BIGINT) AS s_tt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber % 3 = 0 AND year(l_shipdate) = 1997
      GROUP BY 1, 2
    ), with_avg AS (
      SELECT class, moy, s_tt,
             avg(s_tt) OVER (PARTITION BY class) AS av
      FROM monthly
    )
    SELECT class, moy, s_tt / 10000.0 AS sales,
           CAST(floor(av + 0.5) AS BIGINT) / 10000.0 AS avg_sales
    FROM with_avg
    WHERE av > 0 AND abs(s_tt - av) / av > 0.1
    ORDER BY class, moy
    """,
)
def tpcds_q63_class_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 63 (queries/63.sql): the q53 deviation shape at item-CLASS
    / month grain. Same exact fixed-point discipline and dim-partitioned
    window."""
    cat = load_tables(spark, sf_dir)
    li, part = cat.read("lineitem"), cat.read("part")
    monthly = (
        li.filter((F.col("l_linenumber") % 3 == 0) & (F.year("l_shipdate") == 1997))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_type").alias("class"),
            F.month("l_shipdate").cast("int").alias("moy"),
        )
        .agg(F.sum(F.round(_amt() * 10000, 0).cast("long")).cast("long").alias("s_tt"))
    )
    w = W.partitionBy("class")
    with_avg = monthly.withColumn("av", F.avg("s_tt").over(w))
    return (
        with_avg.filter(
            (F.col("av") > 0)
            & (F.abs(F.col("s_tt") - F.col("av")) / F.col("av") > 0.1)
        )
        .select(
            "class", "moy",
            (F.col("s_tt") / 10000.0).alias("sales"),
            (F.floor(F.col("av") + 0.5).cast("long") / 10000.0)
            .alias("avg_sales"),
        )
        .orderBy("class", "moy")
    )


# --- TPC-DS q62: web shipping-latency bucket matrix -------------------------


@register(
    "tpcds_q62_web_latency_matrix",
    """
    SELECT s_nationkey AS warehouse, o_orderpriority AS ship_mode,
      CAST(count(CASE WHEN d <= 30 THEN 1 END) AS BIGINT)               AS d30,
      CAST(count(CASE WHEN d BETWEEN 31 AND 60  THEN 1 END) AS BIGINT)  AS d60,
      CAST(count(CASE WHEN d BETWEEN 61 AND 90  THEN 1 END) AS BIGINT)  AS d90,
      CAST(count(CASE WHEN d BETWEEN 91 AND 120 THEN 1 END) AS BIGINT)  AS d120,
      CAST(count(CASE WHEN d > 120 THEN 1 END) AS BIGINT)               AS dmore
    FROM (
      SELECT s_nationkey, o_orderpriority,
             date_diff('day', o_orderdate::date, l_shipdate::date) AS d
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linenumber % 3 = 2
    ) t GROUP BY 1, 2 ORDER BY warehouse, ship_mode
    """,
)
def tpcds_q62_web_latency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 62 (queries/62.sql): web order-to-ship latency banded
    30/60/90/120/120+ per (warehouse, ship mode). warehouse := supplier
    nation, ship mode := order priority (module derivations). The five
    band counts fuse into ONE aggregate over the channel-pruned scan —
    the q50 matrix family keyed on the shipping dims."""
    cat = load_tables(spark, sf_dir)
    li, orders, sup = cat.read("lineitem"), cat.read("orders"), cat.read("supplier")
    t = (
        li.filter(F.col("l_linenumber") % 3 == 2)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_nationkey", "o_orderpriority",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("d"),
        )
    )
    band = lambda c: F.count(F.when(c, 1)).cast("long")  # noqa: E731
    return (
        t.groupBy(
            F.col("s_nationkey").alias("warehouse"),
            F.col("o_orderpriority").alias("ship_mode"),
        )
        .agg(
            band(F.col("d") <= 30).alias("d30"),
            band(F.col("d").between(31, 60)).alias("d60"),
            band(F.col("d").between(61, 90)).alias("d90"),
            band(F.col("d").between(91, 120)).alias("d120"),
            band(F.col("d") > 120).alias("dmore"),
        )
        .orderBy("warehouse", "ship_mode")
    )


# --- TPC-DS q99: catalog shipping-latency bucket matrix ---------------------


@register(
    "tpcds_q99_catalog_latency_matrix",
    """
    SELECT s_nationkey AS warehouse, o_orderstatus AS call_center,
      CAST(count(CASE WHEN d <= 30 THEN 1 END) AS BIGINT)               AS d30,
      CAST(count(CASE WHEN d BETWEEN 31 AND 60  THEN 1 END) AS BIGINT)  AS d60,
      CAST(count(CASE WHEN d BETWEEN 61 AND 90  THEN 1 END) AS BIGINT)  AS d90,
      CAST(count(CASE WHEN d BETWEEN 91 AND 120 THEN 1 END) AS BIGINT)  AS d120,
      CAST(count(CASE WHEN d > 120 THEN 1 END) AS BIGINT)               AS dmore
    FROM (
      SELECT s_nationkey, o_orderstatus,
             date_diff('day', o_orderdate::date, l_shipdate::date) AS d
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linenumber % 3 = 1
    ) t GROUP BY 1, 2 ORDER BY warehouse, call_center
    """,
)
def tpcds_q99_catalog_latency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 99 (queries/99.sql): the q62 latency matrix on the CATALOG
    channel keyed by (warehouse, call center). call_center :=
    o_orderstatus here so the two matrix queries exercise different
    grouping dims. Same one-pass fused band counts."""
    cat = load_tables(spark, sf_dir)
    li, orders, sup = cat.read("lineitem"), cat.read("orders"), cat.read("supplier")
    t = (
        li.filter(F.col("l_linenumber") % 3 == 1)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_nationkey", "o_orderstatus",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("d"),
        )
    )
    band = lambda c: F.count(F.when(c, 1)).cast("long")  # noqa: E731
    return (
        t.groupBy(
            F.col("s_nationkey").alias("warehouse"),
            F.col("o_orderstatus").alias("call_center"),
        )
        .agg(
            band(F.col("d") <= 30).alias("d30"),
            band(F.col("d").between(31, 60)).alias("d60"),
            band(F.col("d").between(61, 90)).alias("d90"),
            band(F.col("d").between(91, 120)).alias("d120"),
            band(F.col("d") > 120).alias("dmore"),
        )
        .orderBy("warehouse", "call_center")
    )
