"""Type mapping, schema features (computed columns, weak schemas), catalog
statistics/partitioning, UDF registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import rows_set
from ytsaurus_spark.catalog import Catalog, RichPath
from ytsaurus_spark.functions.udf import (
    get_registered,
    register_pandas_udf,
    register_udtf,
)
from ytsaurus_spark.yt_types import (
    ColumnSchema,
    TableSchema,
    materialize_computed_columns,
    spark_type_to_yt,
    yt_type_to_spark,
)


def test_simple_and_composite_types():
    assert yt_type_to_spark("int64") == T.LongType()
    assert yt_type_to_spark("optional<utf8>") == T.StringType()
    assert yt_type_to_spark("list<int32>") == T.ArrayType(T.IntegerType())
    assert yt_type_to_spark("dict<string,double>") == T.MapType(
        T.StringType(), T.DoubleType()
    )
    st = yt_type_to_spark("struct<a:int64,b:list<string>>")
    assert isinstance(st, T.StructType) and st.fieldNames() == ["a", "b"]
    tup = yt_type_to_spark("tuple<int64,string>")
    assert tup.fieldNames() == ["_1", "_2"]
    assert yt_type_to_spark("decimal(20,0)") == T.DecimalType(20, 0)
    var = yt_type_to_spark("variant<int64,string>")
    assert var.fieldNames()[0] == "_tag"
    with pytest.raises(ValueError):
        yt_type_to_spark("frob<int64>")


def test_roundtrip_spark_to_yt():
    assert spark_type_to_yt(T.LongType()) == "int64"
    assert spark_type_to_yt(T.ArrayType(T.StringType())) == "list<utf8>"
    assert (
        spark_type_to_yt(T.MapType(T.StringType(), T.LongType()))
        == "dict<utf8,int64>"
    )


def test_table_schema_weak_mode_and_keys():
    ts = TableSchema(
        columns=[
            ColumnSchema("k", "int64", required=True, sort_order="ascending"),
            ColumnSchema("v", "utf8"),
        ],
        strict=False,
    )
    spark_schema = ts.to_spark()
    assert spark_schema.fieldNames() == ["k", "v", "_rest"]
    assert not spark_schema["k"].nullable
    assert ts.key_columns() == ["k"]


def test_computed_columns(spark):
    ts = TableSchema(
        columns=[
            ColumnSchema("user_id", "int64"),
            ColumnSchema(
                "shard", "int64", expression="pmod(xxhash64(user_id), 8)"
            ),
        ]
    )
    df = spark.createDataFrame([(1,), (2,)], "user_id bigint")
    out = materialize_computed_columns(df, ts)
    rows = out.collect()
    assert all(0 <= r.shard < 8 for r in rows)
    # deterministic: same input -> same shard
    again = materialize_computed_columns(df, ts).collect()
    assert {(r.user_id, r.shard) for r in rows} == {
        (r.user_id, r.shard) for r in again
    }


def test_rich_path_parsing():
    rp = RichPath.parse("lineitem{l_orderkey,l_quantity}[#10:#20]")
    assert rp.path == "lineitem"
    assert rp.columns == ["l_orderkey", "l_quantity"]
    assert (rp.lower_row, rp.upper_row) == (10, 20)
    assert RichPath.parse("orders").columns is None


def test_row_index_range_multi_partition(spark, tmp_path):
    # [#lo:#hi] must address GLOBAL row indexes even when the parquet scan
    # has many partitions (regression: monotonically_increasing_id jumps by
    # 2^33 per partition, so [#50:#100] used to hit only partition 0).
    root = str(tmp_path)
    spark.range(100).select(F.col("id").alias("v")).repartition(5).write.parquet(
        root + "/t.parquet"
    )
    cat = Catalog(spark, root, keys={})
    assert cat.read("t[#10:#20]").count() == 10
    assert cat.read("t[#50:#100]").count() == 50
    assert cat.read("t[#95:#200]").count() == 5
    assert cat.read("t[#0:#100]").count() == 100
    # [:#n] / [#n:] halves partition the table exactly
    lo = {r.v for r in cat.read("t[#0:#37]").collect()}
    hi = {r.v for r in cat.read("t[#37:#100]").collect()}
    assert len(lo) == 37 and len(hi) == 63 and not (lo & hi)
    # deterministic: same range twice -> same rows
    assert lo == {r.v for r in cat.read("t[#0:#37]").collect()}


def test_catalog_rich_read_and_stats(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    df = cat.read("lineitem{l_orderkey,l_quantity}")
    assert df.columns == ["l_orderkey", "l_quantity"]
    stats = cat.columnar_statistics("lineitem", ["l_orderkey", "l_comment"])
    assert stats.get("l_orderkey", 0) > 0
    parts = cat.partition_table("orders", 4)
    assert len(parts) == 4
    total = sum(p.count() for p in parts)
    assert total == cat.read("orders").count()


def test_udf_registry_pandas_and_udtf(spark):
    def double_it(s):  # plain signature -> SCALAR pandas UDF by default
        return s * 2

    register_pandas_udf(spark, "double_it", double_it, "bigint")
    spark.createDataFrame([(21,)], "x bigint").createOrReplaceTempView("u1")
    assert spark.sql("SELECT double_it(x) AS y FROM u1").collect()[0].y == 42
    assert get_registered("double_it") is not None

    class Expand:
        def eval(self, n: int):
            for i in range(n):
                yield (i,)

    register_udtf(spark, "expand_n", Expand, "i int")
    got = rows_set(spark.sql("SELECT * FROM expand_n(3)"))
    assert got == {(0,), (1,), (2,)}


def test_catalog_namespace_ops(spark, tmp_path):
    import pytest as _pytest

    from ytsaurus_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    cat.create_table("t1", df)
    assert cat.exists("t1") and cat.list_tables() == ["t1"]
    assert rows_set(cat.read("t1")) == {(1, "a")}
    # create with mode=error refuses to clobber
    with _pytest.raises(Exception):
        cat.create_table("t1", df)
    cat.create_table("t1", df.withColumn("s", F.lit("b")), mode="overwrite")
    assert rows_set(cat.read("t1")) == {(1, "b")}
    cat.remove_table("t1")
    assert not cat.exists("t1")
    with _pytest.raises(FileNotFoundError):
        cat.remove_table("t1")


def test_rich_path_key_ranges(spark, sf_dir):
    from ytsaurus_spark.catalog import Catalog, RichPath

    rp = RichPath.parse("orders[100:200]")
    assert (rp.lower_key, rp.upper_key) == (100, 200)
    assert rp.lower_row is None
    rp2 = RichPath.parse("t['a':'m']")
    assert (rp2.lower_key, rp2.upper_key) == ("a", "m")
    rp3 = RichPath.parse("t[#5:]")
    assert rp3.lower_row == 5 and rp3.upper_row is None

    cat = Catalog(spark, sf_dir)
    df = cat.read("orders[100:200]")
    keys = [r.o_orderkey for r in df.select("o_orderkey").collect()]
    assert keys and all(100 <= k < 200 for k in keys)
    # half-open upper bound honored, lower inclusive
    assert min(keys) == 100


def test_column_groups_and_locks(spark):
    from ytsaurus_spark.yt_types import ColumnSchema, TableSchema

    sch = TableSchema(
        columns=[
            ColumnSchema("k", "int64", required=True, sort_order="ascending"),
            ColumnSchema("a", "string", group="meta"),
            ColumnSchema("big", "string", group="payload"),
            ColumnSchema("b", "string", group="meta", lock="l1"),
            ColumnSchema("c", "double"),
        ]
    )
    # group colocation: meta columns adjacent, key first
    assert sch.group_order() == ["k", "a", "b", "big", "c"]
    # lock/group surfaced as field metadata for API parity
    f = {x.name: x for x in sch.to_spark().fields}
    assert f["b"].metadata.get("yt.lock") == "l1"
    assert f["a"].metadata.get("yt.group") == "meta"
    assert not f["k"].nullable


def test_validate_required_splits_violations(spark):
    from ytsaurus_spark.yt_types import ColumnSchema, TableSchema

    sch = TableSchema(
        columns=[
            ColumnSchema("k", "int64", required=True),
            ColumnSchema("v", "string"),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (None, "b"), (2, None)], "k bigint, v string")
    ok, bad = sch.validate_required(df)
    assert {r.v for r in ok.collect()} == {"a", None}
    assert [r.v for r in bad.collect()] == ["b"]


def test_schema_compatibility_verdicts():
    from ytsaurus_spark.yt_types import (
        ColumnSchema as C,
        TableSchema,
        check_schema_compatibility,
    )

    old = TableSchema([C("k", "int32", sort_order="ascending"), C("v", "int32")])
    # widening + new optional column: fully compatible
    widened = TableSchema(
        [C("k", "int64", sort_order="ascending"), C("v", "int64"), C("w", "string")]
    )
    assert check_schema_compatibility(old, widened) == "fully_compatible"
    # narrowing needs validation
    narrowed = TableSchema([C("k", "int32", sort_order="ascending"), C("v", "int16")])
    assert check_schema_compatibility(old, narrowed) == "requires_validation"
    # optional -> required needs validation
    req = TableSchema(
        [C("k", "int32", sort_order="ascending"), C("v", "int32", required=True)]
    )
    assert check_schema_compatibility(old, req) == "requires_validation"
    # cross-family type change / new required column / dropped column (strict)
    bad_t = TableSchema([C("k", "string", sort_order="ascending"), C("v", "int32")])
    assert check_schema_compatibility(old, bad_t) == "incompatible"
    new_req = TableSchema(
        [C("k", "int32", sort_order="ascending"), C("v", "int32"), C("z", "int64", required=True)]
    )
    assert check_schema_compatibility(old, new_req) == "incompatible"
    dropped = TableSchema([C("k", "int32", sort_order="ascending")])
    assert check_schema_compatibility(old, dropped) == "incompatible"
    dropped_weak = TableSchema([C("k", "int32", sort_order="ascending")], strict=False)
    assert check_schema_compatibility(old, dropped_weak) == "fully_compatible"
    # re-keying is not evolution
    rekeyed = TableSchema([C("v", "int32", sort_order="ascending"), C("k", "int32")])
    assert check_schema_compatibility(old, rekeyed) == "incompatible"


def test_merge_table_schemas_widens_and_keeps_common_keys():
    from ytsaurus_spark.yt_types import (
        ColumnSchema as C,
        TableSchema,
        merge_table_schemas,
    )

    a = TableSchema(
        [C("k", "int32", sort_order="ascending", required=True), C("x", "int16")]
    )
    b = TableSchema(
        [C("k", "int64", sort_order="ascending", required=True), C("y", "double")]
    )
    m = merge_table_schemas(a, b)
    cols = {c.name: c for c in m.columns}
    assert cols["k"].type_name == "int64" and cols["k"].sort_order == "ascending"
    assert cols["k"].required  # required on both sides stays required
    assert cols["x"].type_name == "int16" and not cols["x"].required
    assert "y" in cols and cols["y"].sort_order is None
    import pytest as _p

    with _p.raises(ValueError):
        merge_table_schemas(
            TableSchema([C("k", "string")]), TableSchema([C("k", "int64")])
        )


def test_alter_table_evolution_rules(spark, tmp_path):
    from ytsaurus_spark.catalog import (
        Catalog,
        alter_table,
        get_table_schema,
        set_table_schema,
    )
    from ytsaurus_spark.yt_types import ColumnSchema, TableSchema

    cat = Catalog(spark=spark, root=str(tmp_path))
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 300, None)], "k bigint, v bigint, s string"
    )
    cat.create_table("t", df)
    old = TableSchema(
        [
            ColumnSchema("k", "int64", sort_order="ascending"),
            ColumnSchema("v", "int64"),
            ColumnSchema("s", "string"),
        ]
    )
    set_table_schema(cat, "t", old)
    assert get_table_schema(cat, "t").key_columns() == ["k"]

    # widening the key prefix is NOT an evolution -> refused
    rekeyed = TableSchema(
        [
            ColumnSchema("k", "int64", sort_order="ascending"),
            ColumnSchema("v", "int64", sort_order="ascending"),
            ColumnSchema("s", "string"),
        ]
    )
    with pytest.raises(ValueError, match="incompatible"):
        alter_table(cat, "t", rekeyed)

    # narrowing int64 -> int32 requires validation; 300 fits, so it passes
    narrowed = TableSchema(
        [
            ColumnSchema("k", "int64", sort_order="ascending"),
            ColumnSchema("v", "int32"),
            ColumnSchema("s", "string"),
        ]
    )
    assert alter_table(cat, "t", narrowed) == "requires_validation"
    assert get_table_schema(cat, "t").columns[1].type_name == "int32"

    # making a column with NULLs required must FAIL validation
    required_s = TableSchema(
        [
            ColumnSchema("k", "int64", sort_order="ascending"),
            ColumnSchema("v", "int32"),
            ColumnSchema("s", "string", required=True),
        ]
    )
    with pytest.raises(ValueError, match="validation failed"):
        alter_table(cat, "t", required_s)
    # failed alter leaves the stored schema untouched
    assert get_table_schema(cat, "t").columns[2].required is False


def test_rich_path_full_range_surface(spark, tmp_path):
    """The reference's full ypath range surface
    (test_input_fetching.py:1592 ypath_simple / 1615 ypath_complex):
    exact row ``[#24]``, exact key-prefix ``[(0,"def")]``, composite
    tuple bounds with prefix semantics, one-sided bounds, and MULTIPLE
    ranges unioned in one suffix."""
    from ytsaurus_spark.client import YtClient

    c = YtClient(root=str(tmp_path), spark=spark)
    rows = [(ki, ks, f"{ki}{ks}") for ki in range(9)
            for ks in ("abc", "def", "ghi")]
    c.create("table", "//tmp/t", attributes={
        "key_columns": ["ki", "ks"], "sorted_by": ["ki", "ks"]})
    c.write_table("//tmp/t", spark.createDataFrame(
        rows, "ki bigint, ks string, v string").coalesce(1))

    def q(rich):
        return sorted(tuple(r) for r in c.read_table(rich).collect())

    assert q("//tmp/t[#3:#6]") == rows[3:6]
    assert q("//tmp/t[#24]") == [rows[24]]
    assert q('//tmp/t[(1,"def"):(2,"ghi")]') == rows[4:8]
    assert q("//tmp/t[(1):(2)]") == rows[3:6]
    assert q('//tmp/t[(0,"def")]') == [rows[1]]
    assert q("//tmp/t[(1)]") == rows[3:6]
    assert q("//tmp/t[#3:#6, #24:]") == rows[3:6] + rows[24:]
    assert q("//tmp/t[:(1)]") == rows[0:3]
    assert q('//tmp/t[(8,"ghi"):]') == [rows[26]]
    assert q("//tmp/t[]") == rows
    # column selection composes with ranges (ranges see the key columns
    # even when the selection drops them)
    got = sorted(r.v for r in c.read_table("//tmp/t{v}[(1):(2)]").collect())
    assert got == ["1abc", "1def", "1ghi"]
