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


def test_mad_outliers_exact(spark):
    from ytsaurus_spark.operators import timeseries

    # key 1: values 1..5 plus a wild 100 -> median 3.00/3.50? lower median:
    # n=6, rank<=3 -> median = 3.00 (300 cents); devs: 200,100,0,100,200,9700
    # lower median of devs (rank<=3 of 0,100,100,200,200,9700) = 100
    # outliers: dev > 300 -> only 9700
    rows = [(i, 1, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 100])]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, value double")
    out = timeseries.mad_outliers(df).collect()[0]
    assert out.n == 6 and out.median_cents == 300
    assert out.mad_cents == 100 and out.n_outliers == 1


def test_interval_join_matches_theta(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from ytsaurus_spark.operators import timeseries

    base = dt.datetime(2024, 1, 1)
    facts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=37 * i)) for i in range(200)],
        "fid bigint, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, base + dt.timedelta(hours=5 * j), base + dt.timedelta(hours=5 * j + 3))
            for j in range(20)
        ],
        "iid bigint, start timestamp, end timestamp",
    )
    got = {
        (r.fid, r.iid)
        for r in timeseries.interval_join(facts, ivs).select("fid", "iid").collect()
    }
    expected = {
        (r.fid, r.iid)
        for r in facts.join(
            ivs, (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
        ).select("fid", "iid").collect()
    }
    assert got == expected and len(expected) > 0
    # plan check: the rewrite must be an equi-join, not nested-loop
    plan = timeseries.interval_join(facts, ivs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_matches_sequential_reference(spark):
    import datetime

    from ytsaurus_spark.operators.timeseries import ewma

    rows = [
        ("a", datetime.datetime(2024, 1, 1, 0, i), float((i * 7) % 5) + 0.125)
        for i in range(50)
    ] + [("b", datetime.datetime(2024, 1, 1, 1, 0), 42.0)]
    df = spark.createDataFrame(rows, ["key", "ts", "value"])
    out = {(r.key, r.ts): r.ewma for r in ewma(df, alpha=0.25, lookback=40).collect()}

    # sequential truncated reference: fold the trailing <=40 values
    vals = [v for _, _, v in rows[:50]]
    for t in range(50):
        trail = vals[max(0, t - 39) : t + 1]
        acc = trail[0]
        for x in trail[1:]:
            acc = 0.25 * x + 0.75 * acc
        assert out[("a", rows[t][1])] == acc  # bit-exact, same fold order
    # single-row key: ewma == value (seed)
    assert out[("b", rows[50][1])] == 42.0


def test_holt_linear_matches_sequential_reference(spark):
    import datetime

    from ytsaurus_spark.operators.timeseries import holt_linear

    rows = [
        ("a", datetime.datetime(2024, 1, 1, 0, i), float((i * 13) % 7) + 0.25)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["key", "ts", "value"])
    got = {r.ts: (r.level, r.trend, r.forecast)
           for r in holt_linear(df, alpha=0.25, beta=0.125, lookback=40).collect()}
    vals = [v for _, _, v in rows]
    for t in range(50):
        trail = vals[max(0, t - 39): t + 1]
        lvl, tr = trail[0], 0.0
        for x in trail[1:]:
            new_lvl = 0.25 * x + 0.75 * (lvl + tr)
            tr = 0.125 * (new_lvl - lvl) + 0.875 * tr
            lvl = new_lvl
        assert got[rows[t][1]] == (lvl, tr, lvl + tr)  # bit-exact


def test_ewma_null_values_skip_trail(spark):
    import datetime

    from ytsaurus_spark.operators.timeseries import ewma, holt_linear

    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base.replace(minute=0), 4.0),
            ("a", base.replace(minute=1), None),
            ("a", base.replace(minute=2), 8.0),
            ("b", base.replace(minute=0), None)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {(r.key, r.ts.minute): r.ewma for r in ewma(df, alpha=0.25).collect()}
    # null row inherits the trail without its own value; next row folds
    # over [4.0, 8.0] exactly as if the null row were absent
    assert out[("a", 1)] == 4.0
    assert out[("a", 2)] == 0.25 * 8.0 + 0.75 * 4.0
    assert out[("b", 0)] is None  # all-null trail -> NULL, both engines
    h = {(r.key, r.ts.minute): (r.level, r.trend)
         for r in holt_linear(df).collect()}
    assert h[("b", 0)] == (None, None)  # NULL state, not [NULL, 0]


def test_lttb_downsample_bruteforce(spark):
    import datetime

    from ytsaurus_spark.operators.timeseries import lttb_downsample

    # One series, 40 points over ~400 s, 8 buckets.
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        ts = base + datetime.timedelta(seconds=i * 10 + (i % 3))
        val = float((i * 37) % 100) / 4.0
        rows.append(("s1", i, ts, val))
    df = spark.createDataFrame(
        rows, "event_type string, event_id bigint, ts timestamp, value double"
    )
    nb = 8
    got = {r.bucket: r for r in lttb_downsample(
        df, n_buckets=nb, series_col="event_type", ts_col="ts",
        val_col="value", id_col="event_id").collect()}
    # Python brute force of the identical integral pipeline.
    xs = [int(ts.timestamp()) for _, _, ts, _ in rows]
    mn, mx = min(xs), max(xs)
    span = max(1, (mx - mn) // nb + 1)
    pts = []
    for (_, pid, ts, val), x in zip(rows, xs):
        pts.append((pid, x - mn, round(val * 100)))
    buckets = {}
    for pid, x, yc in pts:
        buckets.setdefault(x // span, []).append((pid, x, yc))
    order = sorted(buckets)
    want = {}
    for ix, b in enumerate(order):
        if ix == 0 or ix == len(order) - 1:
            continue
        bp, bn = order[ix - 1], order[ix + 1]
        cp, syp = len(buckets[bp]), sum(y for _, _, y in buckets[bp])
        cn, syn = len(buckets[bn]), sum(y for _, _, y in buckets[bn])
        cp2 = (2 * bp + 1) * span
        cn2 = (2 * bn + 1) * span
        best = None
        for pid, x, yc in buckets[b]:
            area2 = abs((cp2 - cn2) * cn * (yc * cp - syp)
                        - (cp2 - 2 * x) * (syn * cp - syp * cn))
            key = (-area2, pid)
            if best is None or key < best[0]:
                best = (key, pid, x, yc, area2)
        want[b] = best[1:]
    assert set(got) == set(want)
    for b, (pid, x, yc, area2) in want.items():
        r = got[b]
        assert (r.id, r.x_s, r.val_cents, r.area2) == (pid, x, yc, area2)


def test_theilsen_bruteforce_even_and_odd_pairs(spark):
    import math

    from ytsaurus_spark.operators.timeseries import theilsen_trend

    def brute(pts):
        pairs = []
        for i, (xi, yi) in enumerate(pts):
            for xj, yj in pts[i + 1:]:
                if xi < xj:
                    pairs.append(((yj - yi) / (xj - xi), xi, xj))
        pairs.sort()
        slope = pairs[(len(pairs) + 1) // 2 - 1][0]
        resid = sorted((y - slope * x, x) for x, y in pts)
        inter = resid[(len(pts) + 1) // 2 - 1][0]
        return (
            math.floor(slope * 1e6 + 0.5) / 1e6,
            math.floor(inter * 1e6 + 0.5) / 1e6,
            len(pairs),
        )

    # Odd pair count (4 points -> 6 pairs? no: 4C2=6 even) and 5 pts = 10.
    for pts in (
        [(0, 10), (1, 12), (2, 100), (3, 16)],            # outlier day
        [(0, 5), (1, 7), (2, 9), (3, 11), (4, 13)],        # perfect line
    ):
        df = spark.createDataFrame(pts, "d bigint, x bigint")
        r = theilsen_trend(df, "d", "x").collect()[0]
        ws, wi, np_ = brute(pts)
        assert (r.slope, r.intercept, r.n_pairs) == (ws, wi, np_)
    # Perfect line: slope exactly 2, intercept exactly 5.
    df = spark.createDataFrame(
        [(0, 5), (1, 7), (2, 9), (3, 11), (4, 13)], "d bigint, x bigint"
    )
    r = theilsen_trend(df, "d", "x").collect()[0]
    assert (r.slope, r.intercept) == (2.0, 5.0)


def test_binary_segmentation_bruteforce(spark):
    from ytsaurus_spark.operators.timeseries import binary_segmentation

    # Step series: level 10 then 50 then 20 — two clear changepoints.
    ys = [10] * 6 + [50] * 6 + [20] * 6
    pts = list(enumerate(ys))
    df = spark.createDataFrame(pts, "d bigint, x bigint")
    out = {(r.level, r.seg): r for r in
           binary_segmentation(df, "d", "x").collect()}

    def peak(seg_pts):
        n = len(seg_pts)
        s = sum(y for _, y in seg_pts)
        cum, best = 0, None
        for d, y in sorted(seg_pts):
            cum += n * y - s
            key = (-abs(cum), d)
            if best is None or key < best[0]:
                best = (key, d, abs(cum))
        return best[1], best[2]

    cp1, pk1 = peak(pts)
    r1 = out[(1, 0)]
    assert (r1.cp, r1.peak_abs_cusum, r1.n_seg) == (cp1, pk1, len(pts))
    left = [(d, y) for d, y in pts if d <= cp1]
    right = [(d, y) for d, y in pts if d > cp1]
    for seg, seg_pts in ((1, left), (2, right)):
        cp, pk = peak(seg_pts)
        r = out[(2, seg)]
        assert (r.cp, r.peak_abs_cusum, r.n_seg) == (cp, pk, len(seg_pts))
        assert (r.seg_lo, r.seg_hi) == (min(d for d, _ in seg_pts),
                                        max(d for d, _ in seg_pts))
