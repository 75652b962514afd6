"""Erasure coding: GF(256) RS/LRC codecs, erasure-coded table storage,
and RemoteCopy with in-flight chunk repair (library/cpp/erasure,
remote_copy_job.cpp repair path)."""

from __future__ import annotations

import itertools
import os
import random

import pytest
from pyspark.sql import functions as F

from ytsaurus_spark.sources import erasure as E


def test_rs_roundtrip_and_mds_property():
    rnd = random.Random(3)
    c = E.ReedSolomon(6, 3)
    for _ in range(25):
        blob = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 4000)))
        parts = c.encode(blob)
        drop = rnd.sample(range(c.total), rnd.randrange(0, 4))  # ≤ m=3
        have = {i: p for i, p in enumerate(parts) if i not in drop}
        assert c.decode(have) == blob
        assert c.repair(have) == dict(enumerate(parts))
    # 4 losses with m=3 is unrecoverable
    parts = c.encode(b"x" * 1000)
    have = {i: p for i, p in enumerate(parts) if i >= 4}
    with pytest.raises(ValueError):
        c.decode(have)


def test_lrc_recovers_every_triple_erasure():
    c = E.Lrc(12)
    blob = os.urandom(5000)
    parts = c.encode(blob)
    for drop in itertools.combinations(range(c.total), 3):
        have = {i: p for i, p in enumerate(parts) if i not in drop}
        assert c.decode(have) == blob, drop


def test_lrc_locality_single_loss():
    """A single lost data part repairs from its LOCAL group only —
    repair_set is 6 group members + the group parity, and that set alone
    reconstructs the part (the LRC selling point: 7 reads, not 12)."""
    c = E.Lrc(12)
    parts = c.encode(os.urandom(3000))
    assert c.repair_set(3) == [0, 1, 2, 4, 5, 12]
    assert c.repair_set(9) == [6, 7, 8, 10, 11, 13]
    import numpy as np

    acc = np.frombuffer(parts[12], np.uint8).copy()
    for i in [0, 1, 2, 4, 5]:
        acc ^= np.frombuffer(parts[i], np.uint8)
    assert acc.tobytes() == parts[3]


def test_erasure_table_write_erase_read(spark, tmp_path):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    tdir = str(tmp_path / "etable")
    stats = E.write_erasure_table(spark, df.repartition(4), tdir, "reed_solomon_6_3")
    assert stats["chunks"] >= 4
    # no plain parquet remains, only part files + sidecars
    assert not any(f.endswith(".parquet") for f in os.listdir(tdir))
    # lose 3 parts of every chunk (= m): still fully readable
    assert E.erase_parts(tdir, [0, 4, 7]) == stats["chunks"] * 3
    rep = E.scrub_report(tdir)
    assert rep["degraded"] == stats["chunks"] and rep["lost"] == 0
    back = E.read_erasure_table(spark, tdir)
    assert back.count() == 2000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(7 * i for i in range(2000))


def test_remote_copy_repairs_erasure_chunks(spark, tmp_path):
    from ytsaurus_spark.client import YtClient
    from ytsaurus_spark.sources.remote_copy_job import RemoteCopyError

    src = YtClient(root=str(tmp_path / "a"), spark=spark)
    dst = YtClient(root=str(tmp_path / "b"), spark=spark)
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    tdir = src._fs("//home/e")
    os.makedirs(os.path.dirname(tdir), exist_ok=True)
    E.write_erasure_table(spark, df.repartition(2), tdir, "lrc_12_2_2")
    E.erase_parts(tdir, [2, 13])  # one data + one local parity per chunk
    summary = dst.run_remote_copy(
        "//home/e", "//copied/e", source_client=src, repair_erasure_chunks=True
    )
    assert summary["parts_repaired"] == 2 * summary["chunks"]
    # the destination is HEALED: every part present, content reads back
    rep = E.scrub_report(dst._fs("//copied/e"))
    assert rep["intact"] == summary["chunks"] and rep["degraded"] == 0
    back = E.read_erasure_table(spark, dst._fs("//copied/e"))
    assert back.count() == 500
    # non-erasure table refuses the repair flag
    src.write_table("//plain", df)
    with pytest.raises(RemoteCopyError):
        dst.run_remote_copy(
            "//plain", "//x", source_client=src, repair_erasure_chunks=True
        )
