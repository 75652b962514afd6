"""Protobuf lenval wire-row tests: codec-level proto2 encoding invariants
plus a DataFrame roundtrip through the Python DataSource.

Wire contract: public proto2 encoding spec; lenval stream layout per the
reference's EFormatType::Protobuf (yt/yt/client/formats/public.h:49-62).
"""

from __future__ import annotations

import datetime
import decimal
import struct
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import rows_set  # noqa: F401
from ytsaurus_spark.sources.protobuf import (
    decode_stream_pb,
    encode_rows_pb,
    read_proto,
    write_proto,
)


@pytest.fixture()
def tmp():
    with tempfile.TemporaryDirectory() as d:
        yield d


_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("u", T.DecimalType(20, 0)),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("s", T.StringType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)

_ROWS = [
    (1, decimal.Decimal(2**63 + 5), 2.5, True, "héllo", b"\x00\xff", [1, 2]),
    (-7, decimal.Decimal(0), -0.0, False, "", b"", []),
    (None, None, None, None, None, None, None),
]


def test_proto_codec_roundtrip():
    data = encode_rows_pb(_ROWS, _SCHEMA)
    back = list(decode_stream_pb(data, _SCHEMA))
    assert back == [tuple(r) for r in _ROWS]


def test_proto_wire_layout():
    """First row of a 1-column int64 table: lenval length + proto2
    key/varint bytes exactly as the public spec lays them out."""
    sch = T.StructType([T.StructField("x", T.LongType())])
    data = encode_rows_pb([(1,)], sch)
    # 4-byte LE length=2, then key (field 1, wire 0) = 0x08, varint 1
    assert data == struct.pack("<I", 2) + b"\x08\x01"
    # negative int64: two's-complement 10-byte varint
    data = encode_rows_pb([(-1,)], sch)
    assert data[4:] == b"\x08" + b"\xff" * 9 + b"\x01"
    # NULL row: empty message (proto2 absent optional field)
    data = encode_rows_pb([(None,)], sch)
    assert data == struct.pack("<I", 0)


def test_proto_unknown_field_skipped():
    """A message with an extra (unknown) field decodes fine — proto2
    forward compatibility."""
    sch1 = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    sch0 = T.StructType([T.StructField("a", T.LongType())])
    data = encode_rows_pb([(5, "drop-me")], sch1)
    assert list(decode_stream_pb(data, sch0)) == [(5,)]


def test_proto_dataframe_roundtrip(spark, tmp):
    df = spark.createDataFrame(
        [
            (1, "x", 1.5, datetime.date(2020, 5, 17), [1, 2]),
            (2, None, None, None, None),
        ],
        "k bigint, s string, v double, d date, a array<bigint>",
    )
    path = f"{tmp}/t"
    write_proto(df, path)
    back = read_proto(spark, path)
    assert back.schema == df.schema
    key = lambda r: repr(r)  # noqa: E731 — arrays are unhashable
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)


def test_proto_timestamp_roundtrip(spark, tmp):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2021, 3, 4, 5, 6, 7, 123456))],
        "k bigint, ts timestamp",
    )
    path = f"{tmp}/ts"
    write_proto(df, path)
    back = read_proto(spark, path)
    assert rows_set(back) == rows_set(df)
