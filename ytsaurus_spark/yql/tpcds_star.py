"""TPC-DS star schema derived from the TPC-H-shaped fixtures, shared by the
Spark execution path and the DuckDB oracle so the reference's bench SQL
(``yt/benchmarks/run/queries/*.sql``) runs VERBATIM on both engines.

One derivation text per TPC-DS table, written in the dual-engine SQL
subset (year/month/day, substr, CASE, %, CAST — no engine-specific
functions). ``{b}`` is the base-table qualifier: empty for Spark (base
fixtures are temp views in an isolated session), ``main.`` for DuckDB
(the oracle wraps derivations as CTEs, and an unqualified base name would
be a circular CTE reference when the star table shadows it — e.g. the
TPC-DS ``customer`` dim over the TPC-H ``customer`` fixture).

Derivation contract (consistent with queries/tpcds_q.py's documented
channel split):

- channel: ``l_linenumber % 3`` (0=store, 1=catalog, 2=web); store_sales
  and store_returns take the store slice;
- returns: lines with ``l_returnflag = 'R'``;
- item: brand = p_brand, brand_id = the digits of p_brand,
  category = first brand digit, manufact/manager ids from p_partkey
  residues (TPC-DS id ranges 1..1000 / 1..40);
- date_dim: distinct fixture ship dates, d_date_sk = yyyymmdd;
- store: supplier with an 8-state residue code;
- money: integer CENTS as BIGINT (the house exactness discipline — sums
  stay exact on any engine; the one metric consumers divide at the end).
"""

from __future__ import annotations

# yyyymmdd surrogate key — the dual-engine date_sk formula
_DSK = (
    "CAST(year(CAST({c} AS DATE)) * 10000 + month(CAST({c} AS DATE)) * 100"
    " + day(CAST({c} AS DATE)) AS BIGINT)"
)

STAR_VIEW_SQL: dict[str, str] = {
    "date_dim": f"""
        SELECT DISTINCT
               {_DSK.format(c='l_shipdate')} AS d_date_sk,
               CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS d_year,
               CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS d_moy,
               CAST(day(CAST(l_shipdate AS DATE)) AS INT) AS d_dom,
               CAST(l_shipdate AS DATE) AS d_date
        FROM {{b}}lineitem
    """,
    "item": """
        SELECT p_partkey AS i_item_sk,
               p_brand AS i_brand,
               CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
               p_type AS i_class,
               substr(p_brand, 7, 1) AS i_category,
               CAST(substr(p_brand, 7, 1) AS INT) AS i_category_id,
               CAST(1 + p_partkey % 1000 AS INT) AS i_manufact_id,
               CAST(1 + p_partkey % 40 AS INT) AS i_manager_id,
               p_retailprice AS i_current_price
        FROM {b}part
    """,
    "store": """
        SELECT s_suppkey AS s_store_sk,
               s_name AS s_store_name,
               CASE CAST(s_suppkey % 8 AS INT)
                 WHEN 0 THEN 'NM' WHEN 1 THEN 'TX' WHEN 2 THEN 'CA'
                 WHEN 3 THEN 'NY' WHEN 4 THEN 'OH' WHEN 5 THEN 'GA'
                 WHEN 6 THEN 'WA' ELSE 'TN'
               END AS s_state
        FROM {b}supplier
    """,
    "customer": """
        SELECT c_custkey AS c_customer_sk,
               c_name AS c_customer_id,
               c_mktsegment AS c_segment
        FROM {b}customer
    """,
    "store_sales": f"""
        SELECT {_DSK.format(c='l_shipdate')} AS ss_sold_date_sk,
               l_partkey AS ss_item_sk,
               l_suppkey AS ss_store_sk,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS ss_sales_price,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                 AS ss_ext_sales_price,
               CAST(l_quantity AS BIGINT) AS ss_quantity
        FROM {{b}}lineitem
        WHERE l_linenumber % 3 = 0
    """,
    "store_returns": f"""
        SELECT {_DSK.format(c='l.l_shipdate')} AS sr_returned_date_sk,
               o.o_custkey AS sr_customer_sk,
               l.l_suppkey AS sr_store_sk,
               CAST(round(l.l_extendedprice * l.l_tax * 100) AS BIGINT)
                 AS sr_fee
        FROM {{b}}lineitem l
        JOIN {{b}}orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R' AND l.l_linenumber % 3 = 0
    """,
}


def star_tables_in(sql: str) -> list[str]:
    """STAR_VIEW_SQL keys referenced by a translated SQL text, in the
    deterministic dict order (derivations are independent of each other,
    so any order is valid as a CTE prefix)."""
    import re

    found = []
    for name in STAR_VIEW_SQL:
        if re.search(rf"\b{name}\b", sql):
            found.append(name)
    return found


def oracle_with_star(sql: str) -> str:
    """Wrap a translated query in main-qualified star-derivation CTEs —
    the DuckDB oracle text (base fixtures are pre-registered views in
    main, so ``main.customer`` reaches the fixture while the CTE name
    ``customer`` carries the TPC-DS dim)."""
    from ytsaurus_spark.yql.dialect import assemble_with

    ctes = [
        (name, STAR_VIEW_SQL[name].format(b="main.").strip())
        for name in star_tables_in(sql)
    ]
    return assemble_with(ctes, sql)


def register_star_views(spark, sf_dir: str):
    """Register the TPC-DS star views in an ISOLATED session (the caller
    passes ``spark.newSession()``) over the base fixture views. All star
    frames are built BEFORE any is registered, so the TPC-DS ``customer``
    dim can shadow the TPC-H ``customer`` view without a resolution cycle.
    Returns the isolated session."""
    from ytsaurus_spark.catalog import load_tables

    load_tables(spark, sf_dir)  # registers the base fixture views
    frames = {
        name: spark.sql(tmpl.format(b=""))
        for name, tmpl in STAR_VIEW_SQL.items()
    }
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
    return spark
