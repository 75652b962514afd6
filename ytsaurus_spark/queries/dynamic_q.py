"""Dynamic-table surface queries: QL select_rows strings, keyed-table
upsert/lookup/delete with aggregate columns, secondary-index reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytsaurus_spark.catalog import load_tables
from ytsaurus_spark.operators.keyed_tables import KeyedTable
from ytsaurus_spark.operators.secondary_index import build_index, query_with_index
from ytsaurus_spark.operators.select_rows import select_rows
from ytsaurus_spark.queries import register


# --- QL string surface (SelectRows) ----------------------------------------

@register(
    "ql_select_rows",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_discount > 0.05 AND l_returnflag != 'N'
    GROUP BY l_returnflag
    """,
)
def ql_select_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return select_rows(
        spark,
        "l_returnflag, round(sum(l_quantity), 2) AS qty, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM [//home/tpch/lineitem] "
        "WHERE l_discount > 0.05 AND l_returnflag != 'N' "
        "GROUP BY l_returnflag",
    )


@register(
    "ql_select_rows_funcs",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE source = 'src1' AND length(text) > 200
          AND contains(text, 'spark')
    ORDER BY doc_id LIMIT 50
    """,
)
def ql_select_rows_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    # QL-name functions (is_prefix/is_substr renames + ORDER BY/LIMIT rule)
    return select_rows(
        spark,
        "doc_id, lang FROM [//home/docs/documents] "
        "WHERE is_prefix('src1', source) AND source = 'src1' "
        "AND length(text) > 200 AND is_substr('spark', text) "
        "ORDER BY doc_id LIMIT 50",
    )


# --- keyed table: aggregate-column upsert ----------------------------------

@register(
    "dyn_aggregate_upsert",
    """
    SELECT o_custkey AS custkey,
           round(sum(o_totalprice), 2) AS spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def dyn_aggregate_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a keyed table (key=custkey, aggregates: spend=sum, n_orders=sum)
    and insert every order as a delta row — the reference's aggregate-column
    write path (test_aggregate_columns.py). Final state == group-by, proving
    fold-on-write ≡ aggregation."""
    cat = load_tables(spark, sf_dir)
    orders = cat.read("orders")
    deltas = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("spend"),
        F.lit(1).cast("long").alias("n_orders"),
    )
    empty = deltas.filter(F.lit(False))
    table = KeyedTable(
        df=empty,
        key_cols=["custkey"],
        aggregates={"spend": "sum", "n_orders": "sum"},
    )
    # two upsert batches to exercise repeated folding (old ⊕ new ⊕ new2)
    first_half = deltas.filter(F.col("custkey") % 2 == 0)
    second_half = deltas.filter(F.col("custkey") % 2 == 1)
    table = table.insert_rows(first_half).insert_rows(second_half)
    return table.df.select(
        "custkey", F.round("spend", 2).alias("spend"), "n_orders"
    )


@register(
    "dyn_lookup_delete",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey % 7 = 0 AND NOT (c_custkey % 21 = 0)
    """,
)
def dyn_lookup_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookupRows by key set, then DeleteRows of a subset, re-lookup."""
    cat = load_tables(spark, sf_dir)
    cust = cat.read("customer").select("c_custkey", "c_mktsegment")
    table = KeyedTable(df=cust, key_cols=["c_custkey"])
    keys = cust.filter(F.col("c_custkey") % 7 == 0).select("c_custkey")
    doomed = cust.filter(F.col("c_custkey") % 21 == 0).select("c_custkey")
    table = table.delete_rows(doomed)
    return table.lookup_rows(keys)


# --- secondary index (WITH INDEX rewrite) ----------------------------------

@register(
    "dyn_secondary_index",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
    """,
)
def dyn_secondary_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    orders = cat.read("orders")
    idx = build_index(orders, ["o_orderpriority"], ["o_orderkey"])
    hits = query_with_index(
        orders, idx, ["o_orderkey"], F.col("o_orderpriority") == "1-URGENT"
    )
    return hits.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_totalprice"
    )
