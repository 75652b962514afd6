"""Skiff wire format + binary YSON codec tests.

Wire spec: reference ``yt/go/skiff/encoder.go`` (row tag + field layout),
``yt/go/yson/scanner.go:56-63`` (binary YSON markers). Roundtrip through
the Spark 4 Python DataSource (``spark.read/write.format("skiff")``).
"""

from __future__ import annotations

import os
import struct
import tempfile

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from tests.conftest import rows_set
from ytsaurus_spark.sources import yson
from ytsaurus_spark.sources.skiff import (
    decode_stream,
    encode_rows,
    read_skiff,
    write_skiff,
)


@pytest.fixture()
def tmp():
    with tempfile.TemporaryDirectory() as d:
        yield d


# ---------------------------------------------------------------- YSON codec


@pytest.mark.parametrize(
    "value",
    [
        None,
        True,
        False,
        0,
        -1,
        63,
        -64,
        (1 << 63) - 1,
        -(1 << 63),
        (1 << 64) - 1,  # uint64 range
        3.5,
        "",
        "héllo",
        b"\x00\xff raw",
        [1, "two", None, [3.0]],
        {"a": 1, "b": [True, {"c": "d"}]},
        [],
        {},
    ],
)
def test_yson_roundtrip(value):
    encoded = yson.dumps(value)
    decoded = yson.loads(encoded, binary_strings=isinstance(value, bytes))
    if isinstance(value, tuple):
        value = list(value)
    assert decoded == value


def test_yson_wire_bytes():
    # Markers per the reference scanner: string=1 int=2 double=3 false=4
    # true=5 uint=6, entity '#', structural ASCII.
    assert yson.dumps(None) == b"#"
    assert yson.dumps(True) == b"\x05"
    assert yson.dumps(1) == b"\x02\x02"  # zigzag(1) = 2
    assert yson.dumps(-1) == b"\x02\x01"  # zigzag(-1) = 1
    assert yson.dumps("ab") == b"\x01\x04ab"  # zigzag(len 2) = 4
    assert yson.dumps(2.0) == b"\x03" + struct.pack("<d", 2.0)
    assert yson.dumps([1]) == b"[\x02\x02;]"
    assert yson.dumps({"k": 1}) == b"{\x01\x02k=\x02\x02;}"


def test_yson_rejects_trailing_and_unknown():
    with pytest.raises(ValueError):
        yson.loads(b"#extra")
    with pytest.raises(ValueError):
        yson.loads(b"\x7f")


# ------------------------------------------------------------- Skiff codec


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("flag", T.BooleanType(), False),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
        ]
    )


def test_skiff_row_layout():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    data = encode_rows([(5, "xy"), (6, None)], schema)
    expected = (
        b"\x00\x00"  # variant16 table tag
        + struct.pack("<q", 5)
        + b"\x01"  # variant8: value present
        + struct.pack("<I", 2)
        + b"xy"
        + b"\x00\x00"
        + struct.pack("<q", 6)
        + b"\x00"  # variant8: null
    )
    assert data == expected
    batches = list(decode_stream(data, schema))
    rows = [tuple(r.values()) for b in batches for r in b.to_pylist()]
    assert rows == [(5, "xy"), (6, None)]


def test_skiff_codec_roundtrip_nested():
    schema = _schema()
    rows = [
        (1, "alice", 0.5, True, b"\x01\x02", ["x", "y"]),
        (2, None, None, False, None, None),
        (3, "bob", -1.25, True, b"", []),
    ]
    out = list(decode_stream(encode_rows(rows, schema), schema))
    got = [tuple(r.values()) for b in out for r in b.to_pylist()]
    assert got == rows


# -------------------------------------------------------- Spark DataSource


def test_skiff_spark_roundtrip(spark, tmp):
    path = os.path.join(tmp, "t")
    df = spark.createDataFrame(
        [
            Row(id=1, name="alice", score=0.5, flag=True, blob=b"\x01", tags=["x"]),
            Row(id=2, name=None, score=None, flag=False, blob=None, tags=None),
        ],
        _schema(),
    )
    write_skiff(df, path)
    assert os.path.exists(os.path.join(path, "_skiff_schema.json"))
    # self-describing read (schema from sidecar)
    back = read_skiff(spark, path)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


def test_skiff_spark_multifile_parallel_read(spark, tmp):
    path = os.path.join(tmp, "t")
    df = spark.range(0, 1000).repartition(4).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    write_skiff(df, path)
    parts = [f for f in os.listdir(path) if f.endswith(".skiff")]
    assert len(parts) == 4  # one file per write partition → one task per file
    back = read_skiff(spark, path)
    assert back.count() == 1000
    assert rows_set(back) == rows_set(df)


def test_skiff_real_table_with_dates(spark, tmp, sf_dir):
    from ytsaurus_spark.catalog import Catalog

    path = os.path.join(tmp, "orders")
    orders = Catalog(spark, sf_dir).read("orders").limit(100)
    write_skiff(orders, path)
    back = read_skiff(spark, path)
    assert rows_set(back) == rows_set(orders)


def test_skiff_embeddings_float_arrays(spark, tmp, sf_dir):
    from ytsaurus_spark.catalog import Catalog

    path = os.path.join(tmp, "emb")
    emb = Catalog(spark, sf_dir).read("embeddings").limit(20)
    write_skiff(emb, path)
    back = read_skiff(spark, path)
    assert back.schema == emb.schema
    a = sorted(back.collect(), key=lambda r: r[0])
    b = sorted(emb.collect(), key=lambda r: r[0])
    assert a == b


def test_skiff_unsupported_type_fails_fast(spark, tmp):
    df = spark.sql("select interval 1 day as iv")
    with pytest.raises(Exception):
        write_skiff(df, os.path.join(tmp, "bad"))


# --- multi-table streams (variant16 tag routing) ---------------------------

def test_skiff_multi_table_roundtrip(spark, tmp):
    from ytsaurus_spark.sources.skiff import read_skiff_multi, write_skiff_multi

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "id bigint, s string"
    )
    b = spark.createDataFrame(
        [(1.5, True), (2.5, False)], "v double, flag boolean"
    )
    path = os.path.join(tmp, "multi")
    write_skiff_multi([a, b], path)
    back_a = read_skiff_multi(spark, path, 0)
    back_b = read_skiff_multi(spark, path, 1)
    assert rows_set(back_a) == rows_set(a)
    assert rows_set(back_b) == rows_set(b)
    assert back_a.schema == a.schema and back_b.schema == b.schema


def test_skiff_multi_wire_interleaved(spark):
    # Tag routing is row-level: decoding a hand-interleaved stream picks
    # out exactly the rows of the requested table.
    sa = T.StructType([T.StructField("id", T.LongType(), False)])
    sb = T.StructType([T.StructField("s", T.StringType(), False)])
    data = (
        encode_rows([(10,)], sa, table_index=0)
        + encode_rows([("hi",)], sb, table_index=1)
        + encode_rows([(20,)], sa, table_index=0)
    )
    batches = list(decode_stream(data, sa, all_schemas=[sa, sb], table_index=0))
    ids = [v for b in batches for v in b.column(0).to_pylist()]
    assert ids == [10, 20]
    strs = [
        v
        for b in decode_stream(data, sb, all_schemas=[sa, sb], table_index=1)
        for v in b.column(0).to_pylist()
    ]
    assert strs == ["hi"]


def test_skiff_unknown_tag_rejected(spark):
    sa = T.StructType([T.StructField("id", T.LongType(), False)])
    data = encode_rows([(1,)], sa, table_index=3)
    with pytest.raises(ValueError, match="tag 3"):
        list(decode_stream(data, sa))


def test_skiff_multi_union_table_index(spark, tmp):
    from ytsaurus_spark.sources.skiff import read_skiff_multi_all, write_skiff_multi

    a = spark.createDataFrame([(1, "x")], "id bigint, s string")
    b = spark.createDataFrame([(9.5,)], "v double")
    path = os.path.join(tmp, "multiu")
    write_skiff_multi([a, b], path)
    rows = read_skiff_multi_all(spark, path).collect()
    by_tag = {r["__table_index"]: r for r in rows}
    assert by_tag[0].id == 1 and by_tag[0].s == "x" and by_tag[0].v is None
    assert by_tag[1].v == 9.5 and by_tag[1].id is None
    assert len(rows) == 2
