"""Z-order layout: correctness of the Morton value and the skipping win."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ytsaurus_spark.operators.layout import (
    file_overlap_fraction,
    layout_zorder,
    zorder_value,
)


def test_zorder_value_interleaves(spark):
    # two dims, values at the corners of the unit square
    df = spark.createDataFrame(
        [(0, 0), (0, 100), (100, 0), (100, 100)], ["x", "y"]
    )
    out = {(r.x, r.y): r["__zval"] for r in zorder_value(df, ["x", "y"]).collect()}
    assert out[(0, 0)] == 0
    # x contributes even bit positions, y odd: (max, 0) < (0, max) interleaved
    assert out[(100, 100)] == (1 << 32) - 1
    assert out[(100, 0)] + out[(0, 100)] == out[(100, 100)]


def test_zorder_constant_column_no_div_zero(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], ["x", "y"])
    vals = [r["__zval"] for r in zorder_value(df, ["x", "y"]).collect()]
    assert len(vals) == 2  # no failure; y collapses to one bucket


def test_zorder_layout_skips_2d_box_queries(spark):
    # 64x64 grid of (x, y); a box query on y alone
    df = (
        spark.range(0, 4096)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    base = tempfile.mkdtemp(prefix="ytspark_zorder_")
    zpath, xpath = os.path.join(base, "z"), os.path.join(base, "xsort")
    layout_zorder(df, ["x", "y"], zpath, n_files=8)
    # contrast: sorted by x only (tight on x, useless for y)
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    z_frac = file_overlap_fraction(zpath, "y", 0, 7)
    x_frac = file_overlap_fraction(xpath, "y", 0, 7)
    assert z_frac < x_frac  # z-order prunes on the SECOND dimension too
    assert z_frac <= 0.5
    # layout preserves content
    assert spark.read.parquet(zpath).count() == 4096
