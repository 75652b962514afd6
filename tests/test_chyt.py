"""CHYT dialect shim unit tests (ytsaurus_spark/chyt.py): translation
forms, PREWHERE folding, concatYtTables* table functions against a
client tree, and the Spark-only function tier."""

from __future__ import annotations

import pytest

from ytsaurus_spark.chyt import chyt_query, translate_chyt


def test_path_refs_and_format_strip():
    t = translate_chyt(
        'select key1, sum(value) from "//tmp/dir/t" group by key1 FORMAT JSON'
    )
    assert 'from t ' in t + " "
    assert "FORMAT" not in t and '"' not in t


def test_if_combinators_and_uniq():
    t = translate_chyt(
        'select countIf(v > 3) as c, sumIf(v, k = 1) as s,'
        ' uniqExact(u) as n from "//x/t"'
    )
    assert "sum(CASE WHEN v > 3 THEN 1 ELSE 0 END)" in t
    assert "coalesce(sum(CASE WHEN k = 1 THEN v END), 0)" in t
    assert "count(DISTINCT u)" in t


def test_if_combinator_empty_match_is_zero(spark):
    # ClickHouse *If combinators return the type default (0), not NULL,
    # for groups where no row matches the condition
    from ytsaurus_spark.chyt import _spark_analyze, resolve_if_defaults

    spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k int, v int") \
        .createOrReplaceTempView("cht_zero")
    rows = spark.sql(resolve_if_defaults(translate_chyt(
        "select k, sumIf(v, v > 100) as s, maxIf(v, v > 100) as m "
        "from cht_zero group by k order by k"
    ), analyze=_spark_analyze(spark))).collect()
    assert [(r.s, r.m) for r in rows] == [(0, 0), (0, 0)]


def test_if_combinator_typed_defaults(spark):
    # ClickHouse's *If default is the ARGUMENT TYPE's default: '' for
    # String, epoch for Date, 0 for numbers — minIf over a DATE column
    # must not raise (the numeric-0 coalesce would) and minIf over STRING
    # must return '', not '0'
    import datetime

    from ytsaurus_spark.chyt import _spark_analyze, resolve_if_defaults

    def run(text):
        return spark.sql(resolve_if_defaults(
            translate_chyt(text), analyze=_spark_analyze(spark)
        ))

    spark.createDataFrame(
        [(1, "a", datetime.date(2024, 3, 1)), (2, "b", datetime.date(2024, 4, 1))],
        "k int, s string, d date",
    ).createOrReplaceTempView("cht_typed")
    r = run(
        "select minIf(s, k > 100) as ms, minIf(d, k > 100) as md, "
        "maxIf(k, k > 100) as mk from cht_typed"
    ).first()
    assert r.ms == "" and r.md == datetime.date(1970, 1, 1) and r.mk == 0
    # non-empty match sets are unaffected
    r2 = run(
        "select minIf(s, k > 1) as ms, minIf(d, k > 1) as md from cht_typed"
    ).first()
    assert r2.ms == "b" and r2.md == datetime.date(2024, 4, 1)


def test_touint64_keeps_decimal_discipline(spark):
    t = translate_chyt("select toUInt64(x) as u from t")
    assert "DECIMAL(20,0)" in t
    # a value in [2^63, 2^64) — legal ClickHouse uint64 — must survive
    spark.createDataFrame([("18446744073709551615",)], "x string") \
        .createOrReplaceTempView("cht_u64")
    r = spark.sql(translate_chyt("select toUInt64(x) as u from cht_u64")).first()
    assert str(r.u) == "18446744073709551615"


def test_prewhere_folding():
    both = translate_chyt('select * from "//x/t" PREWHERE a > 1 WHERE b < 2')
    assert "WHERE (a > 1) AND (b < 2)" in both and "prewhere" not in both.lower()
    only = translate_chyt('select * from "//x/t" PREWHERE a > 1 order by k')
    assert "WHERE (a > 1)" in only and "order by k" in only


def test_prewhere_parenthesizes_or_where(spark):
    # 'PREWHERE p WHERE a OR b' must mean (p) AND (a OR b), never
    # (p AND a) OR b — the unparenthesized fold silently widens results
    t = translate_chyt('select * from "//x/t" PREWHERE p WHERE a OR b limit 3')
    assert "WHERE (p) AND (a OR b)" in t and "limit 3" in t
    spark.createDataFrame(
        [(False, False, True), (True, True, False), (True, False, True)],
        "p boolean, a boolean, b boolean",
    ).createOrReplaceTempView("cht_prew")
    rows = spark.sql(translate_chyt(
        "select * from cht_prew prewhere p where a or b"
    )).collect()
    # row1 fails PREWHERE; under the broken fold (p AND a) OR b it passes
    assert len(rows) == 2 and all(r.p for r in rows)
    # a subquery containing WHERE inside the PREWHERE predicate must not
    # cut the fold short
    t2 = translate_chyt(
        'select * from "//x/t" prewhere k in '
        '(select k from "//x/u" where q = 1) where a or b'
    )
    assert "AND (a or b)" in t2


def test_prewhere_inside_subquery():
    # a PREWHERE in a subquery must not swallow the subquery's closing
    # paren / alias / the outer WHERE into its predicate
    t = translate_chyt(
        'select * from (select * from "//a/t" prewhere a = 1) s where b = 2'
    )
    assert "WHERE (a = 1) )" in t.replace("  ", " ") or "WHERE (a = 1))" in t \
        or "WHERE (a = 1) ) s" in t
    assert "where b = 2" in t and t.count("(") == t.count(")")


def test_intdiv_truncates_toward_zero(spark):
    # ClickHouse intDiv is C++ integer division: intDiv(-7, 2) = -3
    t = translate_chyt("select intDiv(a, b) as q from t")
    assert "DIV" in t
    r = spark.sql(translate_chyt(
        "select intDiv(-7, 2) as a, intDiv(7, 2) as b, intDiv(-7, -2) as c, "
        "intDiv(9007199254740993, 3) as big"
    )).first()
    # 9007199254740993 = 3 * 3002399751580331 is exact only if the
    # division never passes through a double (2^53 + 1)
    assert (r.a, r.b, r.c, r.big) == (-3, 3, 3, 3002399751580331)


def test_multiif_and_dateparts():
    t = translate_chyt(
        "select multiIf(a > 1, 'x', a > 0, 'y', 'z') as m,"
        " toYYYYMM(d) as ym, toDate(ts) as dt from t"
    )
    assert "CASE WHEN a > 1 THEN 'x' WHEN a > 0 THEN 'y' ELSE 'z' END" in t
    assert "year(d) * 100 + month(d)" in t
    assert "CAST(ts AS DATE)" in t


def test_spark_tier_executes(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "k int, arr array<string>"
    )
    df.createOrReplaceTempView("chyt_arr")
    out = spark.sql(
        translate_chyt("select k, arrayJoin(arr) as e from chyt_arr")
    )
    assert out.count() == 3
    h = spark.sql(
        translate_chyt("select cityHash64('x') as h, uniq(k) as u from chyt_arr")
    ).collect()[0]
    assert isinstance(h.h, int) and h.u == 2


def test_concat_yt_tables_range(spark, tmp_path):
    from ytsaurus_spark.client import YtClient

    client = YtClient(root=str(tmp_path / "yt"), spark=spark)
    client.create("map_node", "//tmp/dir", recursive=True)
    for i in range(4):
        client.write_table(
            f"//tmp/dir/table_{i}",
            spark.createDataFrame([(i,)], "i int"),
        )
    out = chyt_query(
        spark,
        "select * from concatYtTablesRange('//tmp/dir') order by i",
        client=client,
    )
    assert [r.i for r in out.collect()] == [0, 1, 2, 3]
    ranged = chyt_query(
        spark,
        "select * from concatYtTablesRange('//tmp/dir', 'table_1',"
        " 'table_2') order by i",
        client=client,
    )
    assert [r.i for r in ranged.collect()] == [1, 2]
    rx = chyt_query(
        spark,
        "select * from concatYtTablesRegexp('//tmp/dir', 'table_*')"
        " order by i",
        client=client,
    )
    assert rx.count() == 4
    with pytest.raises(ValueError, match="needs a client"):
        chyt_query(spark, "select * from concatYtTables('//tmp/dir')")


def test_query_tracker_chyt_engine(spark, tmp_path, sf_dir):
    from ytsaurus_spark.catalog import load_tables
    from ytsaurus_spark.query_tracker import QueryTracker

    load_tables(spark, sf_dir)
    qt = QueryTracker(spark, str(tmp_path / "qt"))
    qid = qt.start_query(
        "chyt",
        'select countIf(l_discount > 0.05) as n from "//home/tpch/lineitem"',
    )
    rec = qt.wait(qid)
    assert rec["state"] == "completed"
    assert qt.read_query_result(qid).collect()[0].n > 0


def test_argmax_and_array_hofs(spark):
    df = spark.createDataFrame(
        [(1, 10, [1, 2, 3]), (2, 30, [4]), (3, 20, [5, 6])],
        "k int, v int, arr array<int>",
    )
    df.createOrReplaceTempView("chyt_hof")
    row = spark.sql(
        translate_chyt(
            "select argMax(k, v) as best,"
            " arrayMap(x -> x * 2, arr) as doubled,"
            " arrayFilter(x -> x > 1, arr) as big,"
            " arraySum(arr) as s"
            " from chyt_hof where k = 1"
            " group by arr"
        )
    ).collect()[0]
    assert row.best == 1
    assert row.doubled == [2, 4, 6]
    assert row.big == [2, 3]
    assert row.s == 6.0


def test_sample_clause(spark, sf_dir):
    t = translate_chyt('select k from "//x/t" SAMPLE 0.5 where k > 1')
    assert "TABLESAMPLE (50 PERCENT)" in t
    with pytest.raises(ValueError, match="fraction"):
        translate_chyt('select k from "//x/t" SAMPLE 1000')
    out = chyt_query(
        spark,
        'select count(*) as n from "//home/tpch/lineitem" SAMPLE 0.1',
        sf_dir=sf_dir,
    ).collect()[0]
    assert out.n >= 0


def test_chyt_execute_mutations(spark, tmp_path):
    from ytsaurus_spark.chyt import chyt_execute
    from ytsaurus_spark.client import YtClient

    client = YtClient(root=str(tmp_path / "yt"), spark=spark)
    # CREATE TABLE ... ENGINE YtTable() (test_ddl.py shape)
    chyt_execute(
        spark,
        'CREATE TABLE "//tmp/m"(i64 Int64, str String, dbl Float64)'
        " ENGINE YtTable()",
        client,
    )
    assert client.exists("//tmp/m")
    # full-row VALUES insert
    chyt_execute(
        spark,
        'insert into "//tmp/m" values (1, \'a\', 0.5), (2, \'b\', 1.5)',
        client,
    )
    assert client.row_count("//tmp/m") == 2
    # partial-column insert: missing columns go NULL (test_mutations.py)
    chyt_execute(spark, 'insert into "//tmp/m"(i64) values (3)', client)
    got = {tuple(r) for r in client.read_table("//tmp/m").collect()}
    assert (3, None, None) in got and len(got) == 3
    # INSERT ... SELECT with the <append=%false> overwrite attribute
    chyt_execute(
        spark,
        'insert into "<append=%false>//tmp/m" select * from "//tmp/m"'
        " where i64 <= 1",
        client,
    )
    assert client.row_count("//tmp/m") == 1
    # DROP TABLE
    chyt_execute(spark, 'drop table "//tmp/m"', client)
    assert not client.exists("//tmp/m")
    with pytest.raises(ValueError, match="does not exist"):
        chyt_execute(spark, 'drop table "//tmp/m"', client)
    chyt_execute(spark, 'drop table if exists "//tmp/m"', client)  # no-op


def test_bracket_array_literals(spark):
    t = translate_chyt("select [1, 2, 3] as a, ['x', 'y'] as s")
    assert "array(1, 2, 3)" in t and "array('x', 'y')" in t
    # subscripts are NOT literals
    t2 = translate_chyt("select m[1] as e from t")
    assert "m[1]" in t2
    r = spark.sql(translate_chyt(
        "select [[1], [2, 3]] as nested, arrayElement([10, 20], -1) as last"
    )).first()
    assert r.nested == [[1], [2, 3]] and r.last == 20


def test_array_join_clause(spark):
    # reference test_join_and_in.py:746: join + ARRAY JOIN literal
    spark.createDataFrame([(1,), (2,)], "a bigint") \
        .createOrReplaceTempView("cht_aj1")
    rows = spark.sql(translate_chyt(
        "select a, b from cht_aj1 array join [3, 4] as b order by a, b"
    )).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 3), (1, 4), (2, 3), (2, 4)]
    # parallel arrays zip positionally (test_composite.py:240 shape)
    rows = spark.sql(translate_chyt(
        "select s, i from cht_aj1 array join ['a', 'b'] as s, [10, 20] as i "
        "where a = 1 order by s"
    )).collect()
    assert [(r.s, r.i) for r in rows] == [("a", 10), ("b", 20)]
    # LEFT ARRAY JOIN keeps rows whose array is empty
    spark.createDataFrame(
        [(1, [5, 6]), (2, [])], "k bigint, arr array<bigint>"
    ).createOrReplaceTempView("cht_aj2")
    rows = spark.sql(translate_chyt(
        "select k, e from cht_aj2 left array join arr as e order by k, e"
    )).collect()
    assert [(r.k, r.e) for r in rows] == [(1, 5), (1, 6), (2, None)]
    # in-place flattening (no alias) is rejected with guidance
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alias"):
        translate_chyt("select arr from cht_aj2 array join arr")


def test_limit_by_clause(spark):
    spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5), (2, 15)], "g int, v int"
    ).createOrReplaceTempView("cht_lb")
    rows = spark.sql(translate_chyt(
        "select g, v from cht_lb order by v desc limit 2 by g"
    )).collect()
    assert sorted((r.g, r.v) for r in rows) == [(1, 20), (1, 30), (2, 5), (2, 15)]
    # outer LIMIT applies after the per-group cut
    rows = spark.sql(translate_chyt(
        "select g, v from cht_lb order by v desc limit 1 by g limit 1"
    )).collect()
    assert [(r.g, r.v) for r in rows] == [(1, 30)]
    with pytest.raises(ValueError, match="ORDER BY"):
        translate_chyt("select g, v from cht_lb limit 2 by g")


def test_limit_by_unselected_columns(spark):
    """ClickHouse resolves LIMIT BY / ORDER BY against the SOURCE, so the
    expressions need not appear in the select list — the rewrite injects
    helper columns and drops them from the output."""
    spark.createDataFrame(
        [(1, 10, 100), (2, 1, 200), (3, 20, 100), (4, 2, 200), (5, 30, 100)],
        "id int, bal int, nk int",
    ).createOrReplaceTempView("cht_lb_src")
    df = spark.sql(translate_chyt(
        "select id from cht_lb_src order by bal desc limit 2 by nk"
    ))
    assert df.columns == ["id"]
    assert sorted(r.id for r in df.collect()) == [2, 3, 4, 5]
    # DISTINCT / GROUP BY selects keep the selected-columns-only rule
    with pytest.raises(ValueError, match="select list"):
        translate_chyt(
            "select distinct id from cht_lb_src "
            "order by bal limit 1 by nk"
        )


def test_with_totals_clause(spark):
    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "g int, v int"
    ).createOrReplaceTempView("cht_wt")
    rows = spark.sql(translate_chyt(
        "select g, sum(v) as s from cht_wt group by g with totals "
        "order by g nulls last"
    )).collect()
    assert [(r.g, r.s) for r in rows] == [(1, 30), (2, 5), (None, 35)]
    with pytest.raises(ValueError, match="GROUP BY"):
        translate_chyt("select 1 with totals")


def test_limit_by_and_totals_in_subquery(spark):
    # scope-awareness: the clauses inside a subquery rewrite only that
    # sub-select, not the enclosing statement
    spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5)], "g int, v int"
    ).createOrReplaceTempView("cht_scope")
    rows = spark.sql(translate_chyt(
        "select sum(v) as s from "
        "(select g, v from cht_scope order by v desc limit 1 by g) t"
    )).collect()
    assert rows[0].s == 35  # 30 (g=1 top) + 5 (g=2 top)
    rows = spark.sql(translate_chyt(
        "select count(*) as n from "
        "(select g, sum(v) as s from cht_scope group by g with totals) t"
    )).collect()
    assert rows[0].n == 3  # two groups + the totals row


def test_boolean_arithmetic_coercion(spark, tmp_path):
    """ClickHouse treats Bool and IN results as UInt8 in arithmetic
    (test_common.py:2035, test_join_and_in.py:661): 2 * b and
    5 + (x IN (...)) must compute, not raise."""
    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.chyt import chyt_query

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//tmp/bt", spark.createDataFrame([(False,), (True,)], "b boolean")
    )
    rows = chyt_query(
        spark, "select b, 2 * b as two_b from `//tmp/bt` order by b",
        client=client,
    ).collect()
    assert [(r.b, r.two_b) for r in rows] == [(False, 0), (True, 2)]

    client.write_table(
        "//tmp/ba", spark.createDataFrame([(0, 0)], "a bigint, b bigint")
    )
    rows = chyt_query(
        spark,
        'select 5 + (a.a in (select a from "//tmp/ba")) as sum '
        'from "//tmp/ba" a left join (select 0 as a) b on a.a = b.a',
        client=client,
    ).collect()
    assert rows[0].sum == 6
    # ordinary arithmetic groups stay untouched
    rows = chyt_query(
        spark, 'select (a + 1) * 2 as x from "//tmp/ba"', client=client
    ).collect()
    assert rows[0].x == 2


def test_join_unqualified_left_bias(spark, tmp_path):
    """CH resolves an unqualified ambiguous column in an ON-join to the
    LEFT side (test_join_and_in.py:81 step 3)."""
    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.chyt import chyt_query

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//tmp/j1",
        spark.createDataFrame(
            [(i, f"foo{i}") for i in (1, 2)], "key bigint, lhs string"
        ),
    )
    client.write_table(
        "//tmp/j2",
        spark.createDataFrame(
            [(i, f"bar{i}") for i in (1, 2)], "key bigint, rhs string"
        ),
    )
    rows = chyt_query(
        spark,
        'select key, lhs, rhs from "//tmp/j1" t1 join "//tmp/j2" t2 '
        "on t1.key = t2.key order by key",
        client=client,
    ).collect()
    assert [(r.key, r.lhs, r.rhs) for r in rows] == [
        (1, "foo1", "bar1"), (2, "foo2", "bar2")]
    # a SELECT alias shadowing the column still wins (no rewrite)
    rows = chyt_query(
        spark,
        'select t2.key as key, lhs from "//tmp/j1" t1 join "//tmp/j2" t2 '
        "on t1.key = t2.key order by key",
        client=client,
    ).collect()
    assert [r.key for r in rows] == [1, 2]


def test_join_left_bias_subquery_and_literals(spark, tmp_path):
    """Left-bias qualification must not reach inside the right join
    source (a subquery resolves its own scope) nor inside string
    literals that happen to contain the shared column name."""
    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.chyt import chyt_query

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//tmp/lb1",
        spark.createDataFrame(
            [(i, f"foo{i}") for i in (1, 2)], "key bigint, lhs string"
        ),
    )
    client.write_table(
        "//tmp/lb2",
        spark.createDataFrame(
            [(i, f"bar{i}") for i in (1, 2)], "key bigint, rhs string"
        ),
    )
    rows = chyt_query(
        spark,
        'select key, lhs, rhs from "//tmp/lb1" t1 '
        'join (select key, rhs from "//tmp/lb2") r on t1.key = r.key '
        "where lhs <> 'key value' order by key",
        client=client,
    ).collect()
    assert [(r.key, r.lhs, r.rhs) for r in rows] == [
        (1, "foo1", "bar1"), (2, "foo2", "bar2")]
    # literal containing the shared name survives verbatim
    rows = chyt_query(
        spark,
        "select 'key value' as lit, key from \"//tmp/lb1\" t1 "
        'join "//tmp/lb2" t2 on t1.key = t2.key order by key',
        client=client,
    ).collect()
    assert rows[0].lit == "key value"
    # aggregates over the shared column still qualify (inside parens)
    rows = chyt_query(
        spark,
        'select sum(key) as s from "//tmp/lb1" t1 '
        'join "//tmp/lb2" t2 on t1.key = t2.key',
        client=client,
    ).collect()
    assert rows[0].s == 3


def test_bool_arithmetic_skips_string_literals(spark, tmp_path):
    """A boolean column name inside a string literal adjacent to an
    arithmetic char must not be rewritten to if(...)."""
    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.chyt import chyt_query

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//tmp/bflag",
        spark.createDataFrame([(False,), (True,)], "flag boolean"),
    )
    rows = chyt_query(
        spark,
        "select 'a + flag' as lit, 2 * flag as x "
        'from "//tmp/bflag" order by flag',
        client=client,
    ).collect()
    assert [(r.lit, r.x) for r in rows] == [("a + flag", 0), ("a + flag", 2)]


def test_tuple_positional_access(spark, tmp_path):
    """CH spells struct-member access by 1-based position — a.1
    (test_composite.py:101); resolved to the field name via the
    session catalog."""
    from pyspark.sql import functions as F

    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.chyt import chyt_query

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//tmp/ts",
        spark.range(1).select(
            F.struct(F.lit("foo").alias("s"),
                     F.lit(42).cast("long").alias("i")).alias("a")
        ),
    )
    r = chyt_query(
        spark, "select a.1 as s, a.2 as i from `//tmp/ts`", client=client
    ).first()
    assert (r.s, r.i) == ("foo", 42)
    # out-of-range positions and non-struct idents pass through untouched
    r = chyt_query(
        spark, "select a.s as s, round(1.5, 1) as x from `//tmp/ts`",
        client=client,
    ).first()
    assert (r.s, float(r.x)) == ("foo", 1.5)


def test_dynamic_timestamp_read(spark, tmp_path):
    """<timestamp=N>//path rich-YPath prefix — CHYT's MVCC read of a
    dynamic table as of a timestamp (test_dynamic_tables.py:344)."""
    import time

    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.chyt import chyt_query

    client = YtClient(root=str(tmp_path), spark=spark)
    client.create("table", "//tmp/dtts", attributes={
        "dynamic": True,
        "schema": [{"name": "key", "type": "int64",
                    "sort_order": "ascending"},
                   {"name": "value", "type": "string"}],
    })
    client.insert_rows(
        "//tmp/dtts",
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "key bigint, value string"),
    )
    ts = time.time()
    time.sleep(0.01)
    client.insert_rows(
        "//tmp/dtts",
        spark.createDataFrame([(2, "B2"), (3, "c")],
                              "key bigint, value string"),
    )
    rows = chyt_query(
        spark, f'select * from `<timestamp={ts}>//tmp/dtts` order by key',
        client=client,
    ).collect()
    assert [(r.key, r.value) for r in rows] == [(1, "a"), (2, "b")]
    rows = chyt_query(
        spark, 'select * from `//tmp/dtts` order by key', client=client,
    ).collect()
    assert [(r.key, r.value) for r in rows] == [
        (1, "a"), (2, "B2"), (3, "c")]


def test_append_attribute_prefix(spark, tmp_path):
    """<append=%true>//path — the reference's standard append spelling
    for write_table."""
    from ytsaurus_spark.client import YtClient

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//tmp/ap", spark.createDataFrame([(1,)], "a bigint"))
    client.write_table(
        "<append=%true>//tmp/ap", spark.createDataFrame([(2,)], "a bigint"))
    assert client.read_table("//tmp/ap").count() == 2
    client.write_table(
        "<append=%false>//tmp/ap", spark.createDataFrame([(9,)], "a bigint"))
    assert [r.a for r in client.read_table("//tmp/ap").collect()] == [9]
