"""YQL table path functions (RANGE/CONCAT/EACH/LIKE/REGEXP —
yql_yt_io_discovery.cpp:101) and FLATTEN COLUMNS (select.cpp:1652)."""

from __future__ import annotations

import pytest

from ytsaurus_spark.client import YtClient
from ytsaurus_spark.yql import yql_execute
from ytsaurus_spark.yql.dialect import YqlUnsupportedError
from ytsaurus_spark.yql.table_functions import expand_table_functions


@pytest.fixture()
def log_client(spark, tmp_path):
    client = YtClient(root=str(tmp_path), spark=spark)
    for d, vals in [
        ("2024-01-01", [1, 2]),
        ("2024-01-02", [3]),
        ("2024-01-03", [4]),
        ("2024-02-01", [5]),
    ]:
        client.write_table(
            f"//logs/app/{d}",
            spark.createDataFrame([(v,) for v in vals], "v bigint"),
        )
    client.write_table(
        "//other/b", spark.createDataFrame([(9,)], "v bigint")
    )
    return client


def test_range_bounds(spark, log_client):
    df = yql_execute(
        spark,
        "select sum(v) as s from "
        "RANGE(`//logs/app`, `2024-01-01`, `2024-01-31`)",
        client=log_client,
    )
    assert df.first().s == 10  # 1+2+3+4; 2024-02-01 pruned by path
    # open-ended lower bound only
    df = yql_execute(
        spark,
        "select sum(v) as s from RANGE(`//logs/app`, `2024-01-03`)",
        client=log_client,
    )
    assert df.first().s == 9  # 4 + 5
    # no bounds = whole directory
    df = yql_execute(
        spark, "select count(*) as n from RANGE(`//logs/app`)",
        client=log_client,
    )
    assert df.first().n == 5


def test_range_prunes_at_path_level(spark, log_client):
    """The expansion must plan scans ONLY for in-range tables — the
    100 TB discipline: a week's query over a year's log dir plans 7
    scans, not 365."""
    out = expand_table_functions(
        "select * from RANGE(`//logs/app`, `2024-01-02`, `2024-01-03`)",
        log_client, spark,
    )
    assert out.count("SELECT * FROM __yql_tf") == 2  # 2 of 5 tables


def test_concat_each_like_regexp(spark, log_client):
    df = yql_execute(
        spark,
        "select sum(v) as s from CONCAT(`//logs/app/2024-01-01`, "
        "`//other/b`)",
        client=log_client,
    )
    assert df.first().s == 12
    df = yql_execute(
        spark,
        "select sum(v) as s from "
        "EACH('//logs/app/2024-01-02;//other/b')",
        client=log_client,
    )
    assert df.first().s == 12
    df = yql_execute(
        spark,
        "select count(*) as n from LIKE(`//logs/app`, '2024-01-%')",
        client=log_client,
    )
    assert df.first().n == 4
    df = yql_execute(
        spark,
        "select count(*) as n from REGEXP(`//logs/app`, '-01$')",
        client=log_client,
    )
    assert df.first().n == 3  # 2024-01-01 and 2024-02-01


def test_table_virtual_columns(spark, log_client):
    """TablePath()/TableName() — per-branch literals, the reference's
    virtual companions of directory reads."""
    df = yql_execute(
        spark,
        "select v, TableName() as tn, TablePath() as tp "
        "from RANGE(`//logs/app`, `2024-01-02`, `2024-01-03`) order by v",
        client=log_client,
    )
    rows = [(r.v, r.tn, r.tp) for r in df.collect()]
    assert rows == [
        (3, "2024-01-02", "//logs/app/2024-01-02"),
        (4, "2024-01-03", "//logs/app/2024-01-03"),
    ]


def test_table_fn_errors(spark, log_client):
    with pytest.raises(ValueError, match="does not exist"):
        yql_execute(spark, "select * from CONCAT(`//nope`)",
                    client=log_client)
    with pytest.raises(ValueError, match="no tables match"):
        yql_execute(
            spark,
            "select * from RANGE(`//logs/app`, `2030-01-01`, `2030-12-31`)",
            client=log_client,
        )
    with pytest.raises(YqlUnsupportedError, match="FILTER"):
        yql_execute(
            spark, "select * from FILTER(`//logs/app`, $f)",
            client=log_client,
        )
    # no client context at all -> the fail-loudly guard names the fn
    with pytest.raises(YqlUnsupportedError, match="RANGE"):
        yql_execute(spark, "select * from RANGE(`//logs/app`)")


def test_flatten_columns_execute(spark, tmp_path):
    from pyspark.sql import functions as F

    client = YtClient(root=str(tmp_path), spark=spark)
    client.write_table(
        "//structs/t",
        spark.range(3).select(
            F.col("id").alias("k"),
            F.struct(
                (F.col("id") * 10).alias("a"),
                F.lit("x").alias("b"),
            ).alias("s"),
        ),
    )
    df = yql_execute(
        spark,
        "select k, a, b from `//structs/t` flatten columns order by k",
        client=client,
    )
    assert [(r.k, r.a, r.b) for r in df.collect()] == [
        (0, 0, "x"), (1, 10, "x"), (2, 20, "x")]


def test_scalar_concat_not_table_fn(spark, log_client):
    """CONCAT over string literals must stay a scalar call."""
    df = yql_execute(
        spark,
        "select concat('//x/', cast(v as string)) as p "
        "from `//other/b`",
        client=log_client,
    )
    assert df.first().p == "//x/9"


def test_table_record_raises(spark, log_client):
    """TableRecord() has no Spark lowering — it must raise a clear
    YqlUnsupportedError, not silently inject virtual columns it never
    substitutes."""
    with pytest.raises(YqlUnsupportedError, match="TableRecord"):
        yql_execute(
            spark,
            "select TableRecord() from RANGE(`//logs/app`)",
            client=log_client,
        )


def test_virtuals_scoped_per_statement(spark, log_client):
    """TablePath() in ONE statement must not widen the expansion of a
    table function in ANOTHER statement of the same script (SELECT *
    there would otherwise grow _yql_table_path/_yql_table_name)."""
    # statement 1 uses TablePath(); statement 2 is a plain SELECT *
    df = yql_execute(
        spark,
        "insert into `//out/withpath` with truncate "
        "select v, TableName() as tn from RANGE(`//logs/app`, "
        "`2024-01-01`, `2024-01-02`);\n"
        "select * from CONCAT(`//other/b`) order by v",
        client=log_client,
    )
    assert df.columns == ["v"]  # no virtual-column widening
    assert [r.v for r in df.collect()] == [9]
    out = log_client.read_table("//out/withpath")
    assert sorted(out.columns) == ["tn", "v"]
    assert {r.tn for r in out.collect()} == {"2024-01-01", "2024-01-02"}


def test_yql_select_expands_table_functions(spark, log_client):
    """yql_select accepts a client and expands table path functions —
    the path the translator's error message points users at."""
    from ytsaurus_spark.yql import yql_select

    df = yql_select(
        spark,
        "select sum(v) as s from RANGE(`//logs/app`, `2024-01-01`, "
        "`2024-01-31`)",
        client=log_client, star=False,
    )
    assert df.first().s == 10


def test_filter_table_function(spark, log_client):
    """FILTER(`//dir`, lambda) — the lambda evaluates over table NAMES
    (yql_yt_io_discovery.cpp MrTableFilter shape): inline form, $binding
    form, and module functions in the body."""
    df = yql_execute(
        spark,
        "select sum(v) as s from FILTER(`//logs/app`, "
        "($n) -> (String::HasPrefix($n, '2024-01')));",
        client=log_client,
    )
    assert df.first().s == 10  # 2024-02-01 excluded by name

    df = yql_execute(
        spark,
        "$jan = ($name) -> (String::Contains($name, '-01-'));\n"
        "select count(*) as n from FILTER(`//logs/app`, $jan);",
        client=log_client,
    )
    assert df.first().n == 4

    with pytest.raises(YqlUnsupportedError, match="one argument"):
        yql_execute(
            spark,
            "select * from FILTER(`//logs/app`, ($a, $b) -> (true));",
            client=log_client,
        )
