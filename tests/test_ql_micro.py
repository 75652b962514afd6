"""QL-style micro-fixture tests, patterned on the reference's
ql_query_ut.cpp strategy (tiny literal tables + full queries + literal
expected outputs — e.g. TQueryEvaluateTest.Simple at :2112-2132).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import rows_set
from ytsaurus_spark.functions import ql as qf


def kv(spark, with_nulls=False):
    if with_nulls:
        return spark.createDataFrame(
            [(1, None), (None, 2)], "k bigint, v bigint"
        )
    return spark.createDataFrame([(4, 5), (10, 11)], "k bigint, v bigint")


def test_filter_simple(spark):
    # mirrors TQueryEvaluateTest.Simple: a>3 over {(4,5),(10,11)}
    df = kv(spark).filter(F.col("k") > 4)
    assert rows_set(df) == {(10, 11)}


def test_null_semantics(spark):
    df = kv(spark, with_nulls=True)
    assert rows_set(df.filter(F.col("v").isNull())) == {(1, None)}
    # null comparisons exclude rows (3-valued logic)
    assert rows_set(df.filter(F.col("v") > 1)) == {(None, 2)}
    assert rows_set(df.filter(qf.if_null(F.col("k"), 0) == 0)) == {(None, 2)}


def test_offset_limit_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    got = [r.k for r in df.orderBy("k").offset(3).limit(2).collect()]
    assert got == [3, 4]


def test_group_having_totals(spark):
    grp = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 5, "x"), (2, 7, "x"), (3, 1, "z")],
        "a bigint, b bigint, s string",
    )
    agg = grp.groupBy("a").agg(F.sum("b").alias("sb"))
    assert rows_set(agg) == {(1, 30), (2, 12), (3, 1)}
    having = agg.filter(F.col("sb") > 10)
    assert rows_set(having) == {(1, 30), (2, 12)}
    # WITH TOTALS: rollup adds the all-groups row with NULL key
    totals = grp.rollup("a").agg(F.sum("b").alias("sb"))
    assert (None, 43) in rows_set(totals)


def test_argmin_argmax_first(spark):
    grp = spark.createDataFrame(
        [(1, 10, "p"), (1, 20, "q"), (2, 7, "r")], "a bigint, b bigint, s string"
    )
    df = grp.groupBy("a").agg(
        qf.argmin(F.col("s"), F.col("b")).alias("amin"),
        qf.argmax(F.col("s"), F.col("b")).alias("amax"),
    )
    assert rows_set(df) == {(1, "p", "q"), (2, "r", "r")}


def test_joins_micro(spark):
    left = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k bigint, x bigint")
    right = spark.createDataFrame([(2, "b"), (3, "c"), (4, "d")], "k bigint, y string")
    assert rows_set(left.join(right, "k")) == {(2, 20, "b"), (3, 30, "c")}
    assert rows_set(left.join(right, "k", "left")) == {
        (1, 10, None),
        (2, 20, "b"),
        (3, 30, "c"),
    }
    assert rows_set(left.join(right, "k", "left_semi")) == {(2, 20), (3, 30)}
    assert rows_set(left.join(right, "k", "left_anti")) == {(1, 10)}
    # ON + residual predicate (the QL ON ... AND pred form)
    res = left.join(right, (left.k == right.k) & (left.x > 25), "inner")
    assert rows_set(res.select(left.k, "y")) == {(3, "c")}


def test_array_join_composite(spark):
    arrays = spark.createDataFrame(
        [(1, [1, 2], {"a": 10}, (5, "s5")), (2, [], {"b": 20}, (6, "s6"))],
        "id bigint, xs array<bigint>, ms map<string,bigint>, st struct<a:bigint,b:string>",
    )
    # ARRAY JOIN = explode (inner: drops empty), LEFT ARRAY JOIN = explode_outer
    inner = arrays.select("id", F.explode("xs").alias("x"))
    assert rows_set(inner) == {(1, 1), (1, 2)}
    outer = arrays.select("id", F.explode_outer("xs").alias("x"))
    assert rows_set(outer) == {(1, 1), (1, 2), (2, None)}
    # composite access: s.member, d["k"], l[i]
    comp = arrays.select(
        "id",
        F.col("st.a").alias("sa"),
        F.element_at("ms", F.lit("a")).alias("ma"),
        F.try_element_at("xs", F.lit(1)).alias("x0"),
    )
    assert rows_set(comp) == {(1, 5, 10, 1), (2, 6, None, None)}


def test_transform_in_between_like(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F"), (3, "Z")], "k bigint, s string")
    t = df.select(
        "k",
        qf.transform_values(F.col("s"), ["O", "F"], ["open", "fin"], "other").alias("t"),
    )
    assert rows_set(t) == {(1, "open"), (2, "fin"), (3, "other")}
    assert rows_set(df.filter(F.col("k").between(2, 3)).select("s")) == {("F",), ("Z",)}
    assert rows_set(df.filter(F.col("s").isin("O", "Z")).select("k")) == {(1,), (3,)}
    assert rows_set(df.filter(F.col("s").like("%F%")).select("k")) == {(2,)}


def test_ql_string_functions(spark):
    df = spark.createDataFrame([("hello world",)], "s string")
    row = df.select(
        qf.is_prefix("hello", F.col("s")).alias("p"),
        qf.is_substr("lo wo", F.col("s")).alias("sub"),
        qf.length_(F.col("s")).alias("len"),
        qf.regex_extract(r"(\w+)$", F.col("s")).alias("last"),
        qf.regex_replace_first(r"l", F.col("s"), "L").alias("rf"),
        qf.regex_replace_all(r"l", F.col("s"), "L").alias("ra"),
    ).collect()[0]
    assert row.p and row.sub and row.len == 11
    assert row.last == "world"
    assert row.rf == "heLlo world"
    assert row.ra == "heLLo worLd"


def test_ql_timestamp_floors(spark):
    df = spark.createDataFrame(
        [("2024-03-15 13:47:21",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    row = df.select(
        qf.timestamp_floor_hour(F.col("ts")).cast("string").alias("h"),
        qf.timestamp_floor_day(F.col("ts")).cast("string").alias("d"),
        qf.timestamp_floor_month(F.col("ts")).cast("string").alias("m"),
        qf.timestamp_floor_year(F.col("ts")).cast("string").alias("y"),
    ).collect()[0]
    assert row.h == "2024-03-15 13:00:00"
    assert row.d == "2024-03-15 00:00:00"
    assert row.m == "2024-03-01 00:00:00"
    assert row.y == "2024-01-01 00:00:00"


def test_yson_any_access(spark):
    # weak-schema 'Any' column: JSON payload + ypath getters
    df = spark.createDataFrame(
        [(1, '{"a": {"b": 7}, "s": "x", "f": 1.5}')], "k bigint, rest string"
    )
    row = df.select(
        qf.try_get_int64(F.col("rest"), "/a/b").alias("i"),
        qf.try_get_string(F.col("rest"), "/s").alias("s"),
        qf.try_get_double(F.col("rest"), "/f").alias("f"),
        qf.try_get_int64(F.col("rest"), "/missing").alias("m"),
    ).collect()[0]
    assert (row.i, row.s, row.f, row.m) == (7, "x", 1.5, None)


def test_recursive_cte_chain_invariants(spark, sf_dir):
    """Each customer's chain visits one order per depth, so at every
    depth n_orders == n_customers == #customers with >= depth orders."""
    import duckdb

    from ytsaurus_spark.queries.ql import ql_recursive_cte

    rows = ql_recursive_cte(spark, sf_dir).collect()
    assert all(r.n_orders == r.n_customers for r in rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    per_cust = [n for (n,) in con.execute(
        "SELECT count(*) FROM orders GROUP BY o_custkey").fetchall()]
    for r in rows:
        assert r.n_customers == sum(1 for n in per_cust if n >= r.depth)
    assert max(r.depth for r in rows) == max(per_cust)


def test_ql_transform_tuple_in_const_group(spark, tmp_path):
    """Round-11 QL text closures: the TRANSFORM expression
    (ast.cpp:321 TTransformExpression) in scalar and tuple forms,
    tuple-IN lowered to coercion-friendly per-column equalities, and
    GROUP BY <integer literal> meaning the CONSTANT (QL has no
    positional group-by)."""
    from ytsaurus_spark.client import YtClient

    c = YtClient(root=str(tmp_path), spark=spark)
    c.create("table", "//dyn/t", attributes={"dynamic": True, "schema": [
        {"name": "k", "sort_order": "ascending"},
        {"name": "s"}, {"name": "v"}]})
    c.insert_rows("//dyn/t", spark.createDataFrame(
        [(1, "ab", 10.5), (2, "cd", -3.0), (3, None, 7.0)],
        "k long, s string, v double"))

    def q(text):
        return [tuple(r) for r in c.select_rows(text).collect()]

    assert q("transform(k, (1, 2), ('one', 'two'), 'other') AS t "
             "FROM [//dyn/t] ORDER BY k LIMIT 3") \
        == [("one",), ("two",), ("other",)]
    assert q("transform(k, (1,), ('one',)) AS t FROM [//dyn/t] "
             "ORDER BY k LIMIT 2") == [("one",), (None,)]
    assert q("transform((k, s), ((1, 'ab'), (2, 'cd')), (10, 20)) AS t "
             "FROM [//dyn/t] ORDER BY k LIMIT 3") \
        == [(10,), (20,), (None,)]
    # bigint column vs int literal coerces per column
    assert q("k FROM [//dyn/t] WHERE (k, s) IN ((1, 'ab'), (9, 'xx'))") \
        == [(1,)]
    assert q("k FROM [//dyn/t] WHERE (k, s) NOT IN ((1, 'ab')) "
             "AND s IS NOT NULL ORDER BY k LIMIT 5") == [(2,)]
    # GROUP BY 1 = one global group, not column ordinal
    assert q("sum(v) AS sv FROM [//dyn/t] GROUP BY 1") == [(14.5,)]
