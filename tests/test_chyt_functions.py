"""CHYT dialect breadth: the YPath*/YSON*/ConvertYson function family,
table functions (ytTables/ytListNodes/ytListTables/ytNodeAttributes/
ytListLogTables/concatYtTablesLike), GLOBAL JOIN/IN, virtual columns,
toTypeName and DESCRIBE — behavior pinned to the reference suite
(yt/chyt/tests/server/test_yson_functions.py, test_table_functions.py,
test_join_and_in.py, test_common.py, test_composite.py)."""

from __future__ import annotations

import pytest

from ytsaurus_spark.chyt import chyt_execute, chyt_query, translate_chyt


@pytest.fixture()
def client(spark, tmp_path):
    from ytsaurus_spark.client import YtClient

    c = YtClient(root=str(tmp_path / "cypress"), spark=spark)
    c.create("map_node", "//tmp")
    return c


# --- YSONExtract family (test_common.py::test_yson_extract) -----------------


def test_yson_extract_family(spark):
    rows = chyt_query(spark, """
        select YSONHas('{a=5;b=6}', 'a') as has_a,
               YSONHas('{a=5;b=6}', 'c') as has_c,
               YSONHas('{a=5;b=[5; 4; 3]}', 'b', 1) as has_b1,
               YSONLength('{a=5;b=6}') as len_map,
               YSONLength('{a=5;b=[5; 4; 3]}', 'b') as len_arr,
               YSONKey('{a=5;b={c=4}}', 'b', 'c') as key_c,
               YSONType('{a=5}') as t_obj,
               YSONType('[1; 3; 4]') as t_arr,
               YSONType('{a=5;b=4}', 'b') as t_int,
               YSONExtractInt('{a=5;b=[5; 4; 3]}', 'b', 1) as i1,
               YSONExtractFloat('[1; 2; 4.4]', 3) as f3,
               YSONExtractBool('[%true; %false]', 1) as b1,
               YSONExtractBool('[%true; %false]', 2) as b2,
               YSONExtractString('[true; false]', 1) as s1,
               YSONExtractString('{a=true; b=false}', 'b') as sb
    """).collect()[0]
    assert rows.has_a is True and rows.has_c is False and rows.has_b1 is True
    assert rows.len_map == 2 and rows.len_arr == 3
    assert rows.key_c == "c"
    assert (rows.t_obj, rows.t_arr, rows.t_int) == ("Object", "Array", "Int64")
    assert rows.i1 == 5 and rows.f3 == 4.4
    assert rows.b1 is True and rows.b2 is False
    assert rows.s1 == "true" and rows.sb == "false"


def test_yson_extract_typed_and_kv(spark):
    r = chyt_query(spark, """
        select YSONExtract('{a=5;b=[5; 4; 3]}', 'b', 'Array(Int64)') as arr,
               YSONExtractKeysAndValues('[{a=5};{a=5;b=6;c=10}]', 2, 'Int8') as kv
    """).collect()[0]
    assert r.arr == [5, 4, 3]
    assert sorted((x["_1"], x["_2"]) for x in
                  (row.asDict() for row in r.kv)) == [
        ("a", 5), ("b", 6), ("c", 10)]


def test_yson_extract_raw(spark):
    from ytsaurus_spark.sources.yson import dumps, loads

    r = chyt_query(spark, """
        select YSONExtractRaw('[{a=5};{a=5;b=6;c=10}]', 2) as raw,
               YSONExtractArrayRaw('["a";0;[1;2;3];{a=10}]') as arr_raw
    """).collect()[0]
    assert loads(r.raw.encode("latin-1")) == {"a": 5, "b": 6, "c": 10}
    assert r.arr_raw == [
        dumps("a").decode("latin-1"),
        dumps(0).decode("latin-1"),
        dumps([1, 2, 3]).decode("latin-1"),
        dumps({"a": 10}).decode("latin-1"),
    ]


def test_yson_extract_out_of_range_is_null(spark):
    r = chyt_query(spark, """
        select YSONExtractBool('[%true; %false]', 10) as b,
               YSONExtractFloat('[1; 2; 4.4]', 42) as f,
               YSONExtractString('{a=true}', 'invalid_key') as s,
               YSONHas('{a=5}', 'c') as h,
               YSONLength('{a=5;b=6}', 'invalid_key') as l
    """).collect()[0]
    assert r.b is None and r.f is None and r.s is None
    assert r.h is False and r.l == 0


# --- YPath family (test_yson_functions.py) ----------------------------------


def test_ypath_const_args(spark):
    r = chyt_query(
        spark,
        "select YPathString('{a=[1;2;{b=xyz}]}', '/a/2/b') as s",
    ).collect()[0]
    assert r.s == "xyz"


def test_ypath_all_types(spark):
    payload = ("'{i64=-42;ui64=23u;bool=%true;dbl=3.14;str=xyz;"
               "subnode={i64=123};arr_i64=[-1;0;1];arr_ui64=[1;1;2;3;5];"
               "arr_dbl=[-1.1;2.71];arr_bool=[%false;%true;%false]}'")
    r = chyt_query(spark, f"""
        select YPathInt64Strict({payload}, '/i64') as i64,
               YPathUInt64Strict({payload}, '/ui64') as ui64,
               YPathDoubleStrict({payload}, '/dbl') as dbl,
               YPathBooleanStrict({payload}, '/bool') as bool,
               YPathStringStrict({payload}, '/str') as str,
               YPathInt64Strict({payload}, '/subnode/i64') as sub,
               YPathArrayInt64Strict({payload}, '/arr_i64') as arr_i64,
               YPathArrayUInt64Strict({payload}, '/arr_ui64') as arr_ui64,
               YPathArrayDoubleStrict({payload}, '/arr_dbl') as arr_dbl,
               YPathArrayBooleanStrict({payload}, '/arr_bool') as arr_bool
    """).collect()[0]
    assert r.i64 == -42 and int(r.ui64) == 23 and r.dbl == 3.14
    assert r.bool is True and r.str == "xyz" and r.sub == 123
    assert r.arr_i64 == [-1, 0, 1]
    assert [int(x) for x in r.arr_ui64] == [1, 1, 2, 3, 5]
    assert r.arr_dbl == [-1.1, 2.71]
    assert r.arr_bool == [False, True, False]


def test_ypath_non_strict_defaults(spark):
    # missing key: scalars -> NULL, arrays -> [] (reference
    # test_read_all_types_non_strict)
    r = chyt_query(spark, """
        select YPathInt64('{}', '/i64') as i64,
               YPathString('{}', '/str') as str,
               YPathArrayInt64('{}', '/arr') as arr,
               YPathString(NULL, NULL) as a,
               YPathString(NULL, '/x') as b,
               YPathString('{a=1}', NULL) as c
    """).collect()[0]
    assert r.i64 is None and r.str is None and r.arr == []
    assert r.a is None and r.b is None and r.c is None


def test_ypath_strict_raises(spark):
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Exception)):
        chyt_query(
            spark, "select YPathInt64Strict('{a=5}', '/i64') as x"
        ).collect()
    # wrong type is also a strict error (i64 holds a string)
    with pytest.raises((PySparkException, Exception)):
        chyt_query(
            spark, "select YPathInt64Strict('{i64=xyz}', '/i64') as x"
        ).collect()


def test_ypath_raw_and_extract(spark):
    from ytsaurus_spark.sources.yson import dumps

    obj_text = "'{a=[1;2;{b=xxx}]}'"
    r = chyt_query(spark, f"""
        select YPathRaw({obj_text}, '') as whole,
               YPathRaw({obj_text}, '', 'text') as whole_text,
               YPathRaw({obj_text}, '/b') as missing,
               YPathRaw('[foo; bar]', '', 'text') as arr_text,
               YPathExtract('{{a=[[1;2;3];[4;5]]}}', '/a/1/1', 'UInt64') as u,
               YPathExtract('{{a=[[1;2;3];[4;5]]}}', '/a',
                            'Array(Array(UInt64))') as aa
    """).collect()[0]
    assert r.whole == dumps({"a": [1, 2, {"b": "xxx"}]}).decode("latin-1")
    assert r.whole_text == '{"a"=[1;2;{"b"="xxx";};];}'
    assert r.missing is None
    assert r.arr_text == '["foo";"bar";]'
    assert int(r.u) == 5
    assert [[int(x) for x in row] for row in r.aa] == [[1, 2, 3], [4, 5]]


def test_ypath_int64_as_any_range(spark, client):
    # the full int64 domain survives (reference test_int64_as_any)
    vals = [-(2**63), -42, 123456789123456789, 2**63 - 1]
    client.write_table(
        "//tmp/any_i64",
        spark.createDataFrame([(str(v),) for v in vals], "a string"),
    )
    r = chyt_query(
        spark,
        "select YPathInt64(a, '') as i from \"//tmp/any_i64\" order by i",
        client=client,
    ).collect()
    assert [x.i for x in r] == sorted(vals)


def test_convert_yson(spark):
    from ytsaurus_spark.sources.yson import dumps

    r = chyt_query(spark, """
        select ConvertYson('{key=[1;2]}', 'text') as t,
               ConvertYson('{key=[1;2]}', 'binary') as b,
               ConvertYson(NULL, 'text') as n
    """).collect()[0]
    assert r.t == '{"key"=[1;2;];}'
    assert r.b == dumps({"key": [1, 2]}).decode("latin-1")
    assert r.n is None
    # pretty roundtrips
    from ytsaurus_spark.sources.yson import loads_text

    p = chyt_query(
        spark, "select ConvertYson('{key=[1;2]}', 'pretty') as p"
    ).collect()[0].p
    assert loads_text(p) == {"key": [1, 2]}
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Exception)):
        chyt_query(spark, "select ConvertYson('{{{{', 'binary') as x").collect()
    with pytest.raises((PySparkException, Exception)):
        chyt_query(spark, "select ConvertYson('{key=1}', 'xxx') as x").collect()


def test_convert_yson_per_row_format(spark, client):
    # format can be a column (reference test_different_format_per_row)
    client.write_table(
        "//tmp/fmt_rows",
        spark.createDataFrame(
            [(0, '{"a": 1}', "text"), (1, '{"a": 1}', "binary")],
            "i bigint, v string, fmt string",
        ),
    )
    r = chyt_query(
        spark,
        'select ConvertYson(v, fmt) as o from "//tmp/fmt_rows" order by i',
        client=client,
    ).collect()
    from ytsaurus_spark.sources.yson import dumps

    assert r[0].o == '{"a"=1;}'
    assert r[1].o == dumps({"a": 1}).decode("latin-1")


# --- GLOBAL JOIN / IN (test_join_and_in.py) ---------------------------------


def test_global_join_broadcasts(spark, client):
    t1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                               "a bigint, b string")
    t2 = spark.createDataFrame([(1, "x"), (3, "y")], "c bigint, d string")
    client.write_table("//tmp/t1", t1)
    client.write_table("//tmp/t2", t2)
    df = chyt_query(
        spark,
        'select * from "//tmp/t1" t1 global join "//tmp/t2" t2 '
        "on t1.a = t2.c order by a",
        client=client,
    )
    assert [(r.a, r.b, r.c, r.d) for r in df.collect()] == [
        (1, "a", 1, "x"), (3, "c", 3, "y")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # GLOBAL IN subquery
    df = chyt_query(
        spark,
        'select a from "//tmp/t1" where a global in '
        '(select c from "//tmp/t2") order by a',
        client=client,
    )
    assert [r.a for r in df.collect()] == [1, 3]
    # scalar GLOBAL IN in the select list
    r = chyt_query(
        spark,
        'select toInt64(3) global in (select c from "//tmp/t2") as hit',
        client=client,
    ).collect()[0]
    assert r.hit is True


def test_global_join_unaliased_subquery(spark, client):
    # an unaliased GLOBAL JOIN (subquery) must not hint a phantom
    # relation named after the next keyword ('on') — the hint is dropped
    # but the join still runs (and Spark/AQE may still broadcast by size)
    t1 = spark.createDataFrame([(1, "a"), (2, "b")], "a bigint, b string")
    t2 = spark.createDataFrame([(1, "x")], "c bigint, d string")
    client.write_table("//tmp/gu1", t1)
    client.write_table("//tmp/gu2", t2)
    from ytsaurus_spark.chyt import _strip_global

    s = _strip_global(
        "select * from t1 GLOBAL JOIN (select c from t2) ON t1.a = c"
    )
    assert "BROADCAST(on)" not in s and "global" not in s.lower()
    df = chyt_query(
        spark,
        'select a, d from "//tmp/gu1" t1 global join '
        '(select * from "//tmp/gu2") on t1.a = c order by a',
        client=client,
    )
    assert [(r.a, r.d) for r in df.collect()] == [(1, "x")]
    # aliased subquery still gets the broadcast hint
    s2 = _strip_global(
        "select * from t1 GLOBAL JOIN (select c from t2) sub ON t1.a = sub.c"
    )
    assert "BROADCAST(sub)" in s2


def test_yson_extract_kv_typed(spark, client):
    # Float64/Bool/UInt64 kv extraction use their own extractors;
    # unsupported target types raise instead of silently coercing via int
    df = chyt_query(
        spark,
        "select YSONExtractKeysAndValues('{a=1.5;b=2.25;c=x}', 'Float64') as kv",
        client=client,
    )
    assert sorted((t._1, t._2) for t in df.first().kv) == [
        ("a", 1.5), ("b", 2.25)]
    df = chyt_query(
        spark,
        "select YSONExtractKeysAndValues('{a=%true;b=5}', 'Bool') as kv",
        client=client,
    )
    assert [(t._1, t._2) for t in df.first().kv] == [("a", True)]
    import pytest

    from ytsaurus_spark.chyt import translate_chyt

    with pytest.raises(ValueError, match="unsupported value type"):
        translate_chyt(
            "select YSONExtractKeysAndValues('{a=1}', 'Date') as kv"
        )


# --- virtual columns ---------------------------------------------------------


def test_virtual_columns_excluded_from_star(spark, client):
    client.write_table(
        "//tmp/vt", spark.createDataFrame([(1,), (2,)], "k bigint")
    )
    df = chyt_query(
        spark,
        "select *, $table_index, $table_path, $table_name from `//tmp/vt` "
        "order by k",
        client=client,
    )
    # * expands to base columns only; virtuals come from the explicit refs
    assert df.columns == ["k", "__table_index", "__table_path", "__table_name"]
    assert [tuple(r) for r in df.collect()] == [
        (1, 0, "//tmp/vt", "vt"), (2, 0, "//tmp/vt", "vt")]


def test_concat_virtual_index_prunes(spark, client):
    client.create("map_node", "//tmp/cd")
    for i in range(4):
        client.write_table(
            f"//tmp/cd/t{i}",
            spark.createDataFrame([(i,)], "v bigint"),
        )
    df = chyt_query(
        spark,
        "select * from concatYtTablesRange('//tmp/cd') "
        "where $table_index % 2 = 0 order by v",
        client=client,
    )
    assert [r.v for r in df.collect()] == [0, 2]


# --- table functions (test_table_functions.py) -------------------------------


def test_yt_list_nodes_and_tables(spark, client):
    client.create("map_node", "//tmp/dir")
    client.create("map_node", "//tmp/dir/subdir")
    client.write_table(
        "//tmp/dir/t0", spark.createDataFrame([], "a bigint")
    )
    client.write_table(
        "//tmp/dir/t1",
        spark.createDataFrame([(1,), (2,), (3,)], "a bigint"),
    )
    rows = chyt_query(
        spark,
        "select $key, $path, type, dynamic, row_count "
        "from ytListNodes('//tmp/dir') order by $key",
        client=client,
    ).collect()
    got = [(r["__key"], r["__path"], r.type,
            r.dynamic, r.row_count) for r in rows]
    assert got == [
        ("subdir", "//tmp/dir/subdir", "map_node", None, None),
        ("t0", "//tmp/dir/t0", "table", False, 0),
        ("t1", "//tmp/dir/t1", "table", False, 3),
    ]
    rows = chyt_query(
        spark,
        "select key from ytListTables('//tmp/dir') order by key",
        client=client,
    ).collect()
    assert [r.key for r in rows] == ["t0", "t1"]


def test_yt_node_attributes(spark, client):
    client.write_table(
        "//tmp/na0", spark.createDataFrame([(1,)], "a bigint")
    )
    rows = chyt_query(
        spark,
        "select $key, key, type from ytNodeAttributes('//tmp/na0')",
        client=client,
    ).collect()
    assert [(r["__key"], r.key, r.type) for r in rows] == [
        ("na0", "na0", "table")]
    with pytest.raises(ValueError, match="needs path arguments"):
        chyt_query(spark, "select key from ytNodeAttributes()", client=client)
    with pytest.raises(ValueError, match="no such node"):
        chyt_query(
            spark,
            "select key from ytNodeAttributes('//does_not_exist')",
            client=client,
        )


def test_yt_tables(spark, client):
    client.create("map_node", "//tmp/dir1")
    client.create("map_node", "//tmp/dir2")
    for path, num in (("//tmp/dir1/t0", 0), ("//tmp/dir1/t1", 1),
                      ("//tmp/dir2/t2", 2), ("//tmp/dir2/t3", 3)):
        client.write_table(
            path, spark.createDataFrame([(num,)], "a bigint")
        )
    client.create("map_node", "//tmp/dir1/subdir")
    q = "select * from ytTables('//tmp/dir1/t0', '//tmp/dir2/t2') order by a"
    assert [r.a for r in chyt_query(spark, q, client=client).collect()] == [0, 2]
    q = "select * from ytTables(ytListTables('//tmp/dir1')) order by a"
    assert [r.a for r in chyt_query(spark, q, client=client).collect()] == [0, 1]
    q = ("select * from ytTables((select path from ytListNodes('//tmp/dir2') "
         "where key = 't2')) order by a")
    assert [r.a for r in chyt_query(spark, q, client=client).collect()] == [2]
    # dir1 contains a subdir -> ytTables over ytListNodes errors
    with pytest.raises(ValueError, match="non-table"):
        chyt_query(
            spark,
            "select * from ytTables(ytListNodes('//tmp/dir1'))",
            client=client,
        )


def test_yt_list_log_tables(spark, client):
    df = spark.createDataFrame([(1,)], "a bigint")
    client.create("map_node", "//tmp/logs")
    paths = [
        "//tmp/logs/1d/2021-01-01",
        "//tmp/logs/1d/2021-01-02",
        "//tmp/logs/1h/2021-01-03T00:00:00",
        "//tmp/logs/1h/2021-01-03T01:00:00",
        "//tmp/logs/30min/2021-01-03T02:00:00",
        "//tmp/logs/30min/2021-01-03T02:30:00",
        "//tmp/logs/stream/5min/2021-01-03T03:00:00",
        "//tmp/logs/stream/5min/2021-01-03T03:05:00",
    ]
    for p in paths:
        client.write_table(p, df)

    def q(text):
        rows = chyt_query(spark, text, client=client).collect()
        return [r["__path"] for r in rows]

    base = "select $path from ytListLogTables('//tmp/logs'{}) order by $key"
    assert q(base.format("")) == paths
    # overlapping finer tables are dropped (covered by coarser periods)
    client.write_table("//tmp/logs/1h/2021-01-02T05:00:00", df)
    client.write_table("//tmp/logs/30min/2021-01-03T01:00:00", df)
    client.write_table("//tmp/logs/stream/5min/2021-01-03T02:30:00", df)
    assert q(base.format("")) == paths
    # from / to clip by interval OVERLAP
    assert q(base.format(", '2021-01-02'")) == paths[1:]
    assert q(base.format(", '2021-01-02T20:00', '2021-01-03 02:40'")) \
        == paths[1:-2]
    assert q(base.format(", '', '2021-01-03 02:30'")) == paths[:-3]
    # a covering 1d table shadows everything finer that day
    client.write_table("//tmp/logs/1d/2021-01-03", df)
    assert q(base.format("")) == [
        "//tmp/logs/1d/2021-01-01",
        "//tmp/logs/1d/2021-01-02",
        "//tmp/logs/1d/2021-01-03",
    ]
    with pytest.raises(ValueError, match="log directory"):
        chyt_query(
            spark,
            "select $path from ytListLogTables('//tmp/nope')",
            client=client,
        )
    # data read through the selection
    rows = chyt_query(
        spark,
        "select count(*) as n from ytTables(ytListLogTables('//tmp/logs'))",
        client=client,
    ).collect()
    assert rows[0].n == 3


def test_concat_like(spark, client):
    client.create("map_node", "//tmp/test_dir")
    df = spark.createDataFrame([(1,)], "i bigint")
    for name in ("table_1", "table_2", "other"):
        client.write_table(f"//tmp/test_dir/{name}", df)
    r = chyt_query(
        spark,
        "select count(*) as n from concatYtTablesLike('//tmp/test_dir',"
        " 'table*')",
        client=client,
    ).collect()
    assert r[0].n == 2


# --- toTypeName / DESCRIBE (test_clickhouse_schema.py, test_composite.py) ----


def test_totypename_and_describe(spark, client):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "x", 1.5, {"k1": "v1"}, [1, 2], (5, "s"))],
        "i bigint, s string, d double, m map<string,string>, "
        "a array<bigint>, t struct<x: bigint, y: string>",
    )
    client.write_table("//tmp/typed", df.select(
        "i", "s", "d", "m", "a", F.col("t")))
    r = chyt_query(
        spark,
        'select toTypeName(i) as ti, toTypeName(m) as tm, '
        'toTypeName(a) as ta, toTypeName(t) as tt, toTypeName(i + 1) as te '
        'from "//tmp/typed" limit 1',
        client=client,
    ).collect()[0]
    assert r.ti == "Nullable(Int64)"
    assert r.tm == "Map(String, String)"
    assert r.ta == "Array(Int64)"
    assert r.tt == "Tuple(x Int64, y String)"
    assert r.te == "Nullable(Int64)"
    rows = chyt_query(spark, 'describe "//tmp/typed"', client=client).collect()
    assert [(x.name, x.type) for x in rows] == [
        ("i", "Nullable(Int64)"), ("s", "Nullable(String)"),
        ("d", "Nullable(Float64)"), ("m", "Map(String, String)"),
        ("a", "Array(Int64)"), ("t", "Tuple(x Int64, y String)"),
    ]


def test_create_table_as_select(spark, client):
    client.write_table(
        "//tmp/src",
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
    )
    chyt_execute(
        spark,
        'create table "//tmp/ctas" engine YtTable() as '
        'select * from "//tmp/src" where k = 2',
        client,
    )
    got = client.read_table("//tmp/ctas").collect()
    assert [(r.k, r.v) for r in got] == [(2, "b")]


def test_numbers_and_misc_functions(spark):
    r = chyt_query(spark, """
        select sum(number) as s from numbers(100)
    """).collect()[0]
    assert r.s == 4950
    r = chyt_query(spark, """
        select ifNull(NULL, 7) as c, modulo(10, 3) as m,
               intDiv(10, 3) as d, splitByChar('.', 'a.b.c') as parts,
               indexOf(array(10, 20, 30), 20) as idx,
               arrayElement(array(1, 2, 3), -1) as last
    """).collect()[0]
    assert r.c == 7 and r.m == 1 and r.d == 3
    assert list(r.parts) == ["a", "b", "c"]
    assert r.idx == 2 and r.last == 3


def test_mutations_backtick_and_truncate(spark, client):
    chyt_execute(
        spark,
        "CREATE TABLE `//tmp/bt`(i64 Int64, str String) ENGINE YtTable()",
        client,
    )
    chyt_execute(
        spark, "insert into `//tmp/bt` values (1, 'a'), (2, 'b')", client
    )
    assert client.row_count("//tmp/bt") == 2
    # overwrite-from-self through the backtick attr form
    chyt_execute(
        spark,
        "insert into `<append=%false>//tmp/bt` select * from `//tmp/bt` "
        "where i64 = 2",
        client,
    )
    assert client.row_count("//tmp/bt") == 1
    # TRUNCATE keeps schema, drops rows
    chyt_execute(spark, "truncate table `//tmp/bt`", client)
    df = client.read_table("//tmp/bt")
    assert df.count() == 0 and df.columns == ["i64", "str"]
    chyt_execute(spark, "truncate table if exists `//tmp/nope`", client)
    with pytest.raises(ValueError, match="does not exist"):
        chyt_execute(spark, "truncate table `//tmp/nope`", client)
    chyt_execute(spark, "drop table `//tmp/bt`", client)
    assert not client.exists("//tmp/bt")


def test_chyt_reads_dynamic_tables(spark, client):
    # CHYT reads dynamic tables through the same path layer
    # (test_dynamic_tables.py): latest-committed row images
    client.create("table", "//tmp/dyn", attributes={
        "dynamic": True,
        "schema": [
            {"name": "k", "type": "int64", "sort_order": "ascending"},
            {"name": "v", "type": "string"},
        ],
    })
    client.insert_rows(
        "//tmp/dyn",
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
    )
    client.insert_rows(
        "//tmp/dyn",
        spark.createDataFrame([(2, "B"), (3, "c")], "k bigint, v string"),
    )
    rows = chyt_query(
        spark,
        'select k, v, count(*) over () as n from "//tmp/dyn" order by k',
        client=client,
    ).collect()
    assert [(r.k, r.v) for r in rows] == [(1, "a"), (2, "B"), (3, "c")]


# --- SQL UDFs (test_sql_udf.py) ----------------------------------------------


def test_sql_udf_create_use_drop(spark, client):
    # test_simple_udf: calling before CREATE fails; after CREATE it works
    with pytest.raises(Exception):
        chyt_query(
            spark,
            "select number, linear_equation(number, 2, 1) from numbers(3)",
            client=client,
        ).collect()

    chyt_execute(
        spark,
        "create function linear_equation as (x, k, b) -> k*x + b",
        client=client,
    )
    rows = chyt_execute(
        spark,
        "select number, linear_equation(number, 2, 1) as result "
        "from numbers(2)",
        client=client,
    ).collect()
    assert [(r.number, r.result) for r in rows] == [(0, 1), (1, 3)]

    # test_udf_is_registered_on_each_instance: a SECOND session sees the
    # persisted function (Cypress-backed, not session state)
    from ytsaurus_spark.client import YtClient

    c2 = YtClient(root=client.root, spark=spark)
    rows = chyt_query(
        spark,
        "select linear_equation(number, 2, 1) as r from numbers(1)",
        client=c2,
    ).collect()
    assert rows[0].r == 1

    # test_drop_udf: drop of a missing function errors; IF EXISTS doesn't
    chyt_execute(spark, "drop function linear_equation", client=client)
    with pytest.raises(ValueError, match="does not exist"):
        chyt_execute(spark, "drop function linear_equation", client=client)
    chyt_execute(
        spark, "drop function if exists linear_equation", client=client
    )
    with pytest.raises(Exception):
        chyt_query(
            spark,
            "select linear_equation(number, 2, 1) from numbers(3)",
            client=client,
        ).collect()


def test_sql_udf_replace_and_bad_names(spark, client):
    # test_replace_udf: plain re-CREATE errors, OR REPLACE swaps the body
    chyt_execute(
        spark,
        "create function linear_equation as (x, k, b) -> k*x + b",
        client=client,
    )
    with pytest.raises(ValueError, match="already exists"):
        chyt_execute(
            spark,
            "create function linear_equation as (x, k) -> k*x",
            client=client,
        )
    chyt_execute(
        spark,
        "create or replace function linear_equation as (x, k) -> k*x",
        client=client,
    )
    r = chyt_query(
        spark,
        "select linear_equation(number, 2) as result from numbers(1)",
        client=client,
    ).first()
    assert r.result == 0
    # test_bad_udf_name: non-identifier names are rejected
    for bad in ('"@acl"', '"some/path"'):
        with pytest.raises(ValueError, match="invalid function name"):
            chyt_execute(
                spark,
                f"create function {bad} as (x, k) -> k*x",
                client=client,
            )
    # test_bad_query_in_cypress: a malformed persisted statement surfaces
    # at CALL time, not at load time
    client.write_file(
        "//sys/chyt/clique/user_defined_sql_functions/broken",
        b"create function broken as (x, k, b) ->",
    )
    with pytest.raises(ValueError, match="Failed to parse"):
        chyt_query(
            spark, "select broken(1, 2, 3) as r from numbers(1)",
            client=client,
        )
    # unrelated queries are unaffected by the broken definition
    assert chyt_query(
        spark,
        "select linear_equation(number, 3) as r from numbers(1)",
        client=client,
    ).first().r == 0


def test_sql_udf_inlining_is_textual_and_nested(spark, client):
    # composed + nested calls inline fully (stay in whole-stage codegen);
    # arguments with regex-special characters survive the substitution
    chyt_execute(
        spark, "create function double_it as (x) -> x + x", client=client
    )
    chyt_execute(
        spark,
        "create function quad as (x) -> double_it(double_it(x))",
        client=client,
    )
    r = chyt_query(
        spark,
        r"select quad(number + 1) as q, "
        r"double_it(length('a\\b')) as l from numbers(1)",
        client=client,
    ).first()
    assert r.q == 4 and r.l == 6


# --- YT-backed dictionaries (test_yt_dictionaries.py) ------------------------


def _flat_dict_config(path="//tmp/dict"):
    # the reference clique config_patch shape, verbatim
    return {
        "name": "dict",
        "layout": {"flat": {}},
        "structure": {
            "id": {"name": "key"},
            "attribute": [
                {"name": "value_str", "type": "String", "null_value": "n/a"},
                {"name": "value_i64", "type": "Int64", "null_value": 42},
            ],
        },
        "lifetime": 0,
        "source": {"yt": {"path": path}},
    }


def test_dict_int_key_flat(spark, client):
    # test_int_key_flat: misses return the structure's null_value
    client.write_table(
        "//tmp/dict",
        spark.createDataFrame(
            [(i, "str" + str(i), i * i) for i in (1, 3, 5)],
            "key bigint, value_str string, value_i64 bigint",
        ),
    )
    rows = chyt_query(
        spark,
        "select number, dictGetString('dict', 'value_str', number) as str, "
        "dictGetInt64('dict', 'value_i64', number) as i64 from numbers(5) "
        "order by number",
        client=client,
        dictionaries=[_flat_dict_config()],
    ).collect()
    assert [(r.number, r.str, r.i64) for r in rows] == [
        (0, "n/a", 42), (1, "str1", 1), (2, "n/a", 42),
        (3, "str3", 9), (4, "n/a", 42),
    ]


def test_dict_composite_key_hashed(spark, client):
    # test_composite_key_hashed: tuple(key, subkey) composite lookup
    client.write_table(
        "//tmp/dict",
        spark.createDataFrame(
            [("a", 1, "a1"), ("a", 2, "a2"), ("b", 1, "b1")],
            "key string, subkey bigint, value string",
        ),
    )
    client.write_table(
        "//tmp/queries",
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 1), ("b", 2)],
            "key string, subkey bigint",
        ),
    )
    config = {
        "name": "dict",
        "layout": {"complex_key_hashed": {}},
        "structure": {
            "key": {
                "attribute": [
                    {"name": "key", "type": "String"},
                    {"name": "subkey", "type": "Int64"},
                ]
            },
            "attribute": [
                {"name": "value", "type": "String", "null_value": "n/a"}
            ],
        },
        "lifetime": 0,
        "source": {"yt": {"path": "//tmp/dict"}},
    }
    rows = chyt_query(
        spark,
        "select dictGetString('dict', 'value', tuple(key, subkey)) as value "
        'from "//tmp/queries" order by key, subkey',
        client=client,
        dictionaries=[config],
    ).collect()
    assert [r.value for r in rows] == ["a1", "a2", "b1", "n/a"]


def test_dict_update_has_default_and_errors(spark, client):
    # test_lifetime's observable core: a rewritten dict table is seen by
    # the next query (our reads are always current); dictHas;
    # dictGetOrDefault; undeclared dictionary errors (CHYT-611)
    client.write_table(
        "//tmp/dict",
        spark.createDataFrame([(42, "x")], "key bigint, value string"),
    )
    cfg = {
        "name": "dict",
        "layout": {"flat": {}},
        "structure": {
            "id": {"name": "key"},
            "attribute": [
                {"name": "value", "type": "String", "null_value": "n/a"}
            ],
        },
        "lifetime": 1,
        "source": {"yt": {"path": "//tmp/dict"}},
    }
    q = "select dictGetString('dict', 'value', 42) as value"
    assert chyt_query(spark, q, client=client,
                      dictionaries=[cfg]).first().value == "x"
    client.write_table(
        "//tmp/dict",
        spark.createDataFrame([(42, "y")], "key bigint, value string"),
    )
    assert chyt_query(spark, q, client=client,
                      dictionaries=[cfg]).first().value == "y"
    r = chyt_query(
        spark,
        "select dictHas('dict', 42) as h42, dictHas('dict', 7) as h7, "
        "dictGetOrDefault('dict', 'value', 7, 'fallback') as f",
        client=client,
        dictionaries=[cfg],
    ).first()
    assert (r.h42, r.h7, r.f) == (True, False, "fallback")
    # test_dict_does_not_exist
    with pytest.raises(ValueError, match="not declared"):
        chyt_query(
            spark,
            "select dictGetString('this_dict_does_not_exist', 'value', 1)",
            client=client,
        )


def test_show_tables_opaque_hidden(spark, client):
    from ytsaurus_spark.chyt import chyt_execute

    for p in ("//tmp/root/t1", "//tmp/root/sub/t2"):
        d = p.rsplit("/", 1)[0]
        if not client.exists(d):
            client.create("map_node", d, recursive=True)
        client.write_table(p, spark.createDataFrame([(1,)], "a bigint"))
    client.create("map_node", "//tmp/root/hidden")
    client.write_table(
        "//tmp/root/hidden/t3", spark.createDataFrame([(1,)], "a bigint")
    )
    client.set("//tmp/root/hidden/@opaque", True)
    rows = chyt_execute(
        spark, 'show tables from "//tmp/root"', client=client
    ).collect()
    # opaque subtrees are hidden (test_common.py:50-53)
    assert [r.name for r in rows] == ["//tmp/root/sub/t2", "//tmp/root/t1"]


def test_show_tables_no_from(spark, client):
    """Bare SHOW TABLES walks the whole tree from '//' — the '//' root
    must build '//name' child paths, not '/name'."""
    client.create("map_node", "//bare", recursive=True)
    client.write_table("//bare/t1", spark.createDataFrame([(1,)], "a bigint"))
    rows = chyt_execute(spark, "show tables", client=client).collect()
    assert "//bare/t1" in [r.name for r in rows]
    rows = chyt_execute(
        spark, "show tables like '%bare%'", client=client
    ).collect()
    assert [r.name for r in rows] == ["//bare/t1"]


def test_sql_udf_simultaneous_substitution(spark, client):
    """An argument whose text is another parameter's NAME must not be
    re-substituted: linear_equation(k, 2, 1) with body 'k*x + b' keeps
    the column k (previously inlined to the literal 2)."""
    chyt_execute(
        spark,
        "create or replace function lin_sim as (x, k, b) -> k*x + b",
        client=client,
    )
    client.write_table(
        "//tmp/simsub", spark.createDataFrame([(10,)], "k bigint")
    )
    rows = chyt_execute(
        spark, 'select lin_sim(k, 2, 1) as r from "//tmp/simsub"',
        client=client,
    ).collect()
    assert rows[0].r == 21  # 2*10 + 1, NOT 2*2 + 1


def test_sql_udf_many_flat_calls(spark, client):
    """>16 NON-nested calls expand in one pass — the 16 cap measures
    nesting depth, not call count."""
    chyt_execute(
        spark, "create or replace function sq_flat as (x) -> x*x",
        client=client,
    )
    exprs = ", ".join(f"sq_flat({i}) as c{i}" for i in range(20))
    row = chyt_execute(
        spark, f"select {exprs} from numbers(1)", client=client
    ).first()
    assert [row[f"c{i}"] for i in range(20)] == [i * i for i in range(20)]
    # genuine cycles still exceed the cap
    chyt_execute(
        spark, "create or replace function cyc as (x) -> cyc(x)",
        client=client,
    )
    with pytest.raises(ValueError, match="depth 16"):
        chyt_execute(spark, "select cyc(1)", client=client)


def test_ch_function_breadth_round11(spark, client):
    """Round-11 CH spellings: arrayReverseSort, range/arrayEnumerate
    (empty-safe), arrayStringConcat, replaceAll/One/RegexpAll,
    today/yesterday, bit ops, lagInFrame/leadInFrame, parametric
    quantile(p)(x) / quantileExact / topK(k)(x), median,
    formatDateTime."""
    from ytsaurus_spark.chyt import chyt_execute

    client.create("map_node", "//tmp", ignore_existing=True)
    client.write_table("//tmp/fb", spark.createDataFrame(
        [(1, 1.5), (2, -2.0), (3, 0.5), (2, 9.0)],
        "k bigint, v double").coalesce(1))

    def one(sql):
        rows = chyt_execute(spark, sql, client=client).collect()
        return rows[0][0] if rows else None

    assert one("select arrayReverseSort([1,3,2]) as a") == [3, 2, 1]
    assert one("select range(3) as r") == [0, 1, 2]
    assert one("select range(0) as r") == []
    assert one("select range(2, 5) as r") == [2, 3, 4]
    assert one("select arrayEnumerate([7,8]) as e") == [1, 2]
    assert one("select arrayEnumerate(array()) as e") == []
    assert one("select arrayStringConcat(['a','b'], '-') as s") == "a-b"
    assert one("select arrayStringConcat(['a','b']) as s") == "ab"
    assert one("select replaceOne('aaa', 'a', 'b') as r") == "baa"
    assert one("select replaceRegexpAll('a1b2', '[0-9]', '') as r") == "ab"
    assert one("select bitAnd(6, 3) as a") == 2
    assert one("select bitShiftLeft(1, 4) as l") == 16
    assert one("select median(k) as m from `//tmp/fb`") == 2.0
    assert one("select quantile(0.5)(k) as q from `//tmp/fb`") == 2.0
    assert one("select quantileExact(0.25)(k) as q from `//tmp/fb`") == 1.75
    assert one("select topK(2)(k) as t from `//tmp/fb`") == [2, 1]
    assert one("select formatDateTime(toDate('2024-03-05'), '%Y-%m') as f") \
        == "2024-03"
    assert one("select k - lagInFrame(k) over (order by k, v) as d "
               "from `//tmp/fb` order by k, v limit 2") is None
