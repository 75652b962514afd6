"""Unit tests for time-series densification (operators/timeseries.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ytsaurus_spark.operators.timeseries import gap_fill, resample
from ytsaurus_spark.plans import unpartitioned_window_count


def _series(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 30), 1.0),
        ("a", datetime(2024, 1, 1, 3, 10), 2.0),
        ("b", datetime(2024, 1, 1, 5, 0), 5.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_gap_fill_densifies_per_key_span(spark):
    out = gap_fill(_series(spark), "user_id", "ts", "value").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r)
    # a spans hours 0..3 -> 4 buckets, two filled with 0
    assert len(by_key["a"]) == 4
    assert sorted(r.value for r in by_key["a"]) == [0.0, 0.0, 1.0, 2.0]
    # b has a single bucket -> no fills
    assert len(by_key["b"]) == 1 and by_key["b"][0].value == 5.0


def test_resample_forward_fills(spark):
    out = resample(_series(spark), "user_id", "ts", "value")
    a = sorted(
        (r for r in out.collect() if r.user_id == "a"), key=lambda r: r.bucket
    )
    assert [r.value for r in a] == [1.0, 1.0, 1.0, 2.0]
    assert [r.was_gap for r in a] == [False, True, True, False]


def test_fill_window_is_key_partitioned(spark):
    out = resample(_series(spark), "user_id", "ts", "value")
    assert unpartitioned_window_count(out) == 0
