"""MATCH_RECOGNIZE engine semantics on micro-fixtures: MEASURES over the
matched row range and AFTER MATCH SKIP policies (the reference's
sql_match_recognize.cpp subset)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ytsaurus_spark.operators.match_recognize import (
    match_recognize,
    match_recognize_measures,
)

def SYMBOLS():
    return [
        ("c", F.col("t") == "click"),
        ("v", F.col("t") == "view"),
        ("p", F.col("t") == "purchase"),
    ]


@pytest.fixture()
def seq_df(spark):
    # user 1: c v v p  c p      -> two cv*p matches
    # user 2: v v v             -> view run of 3, no funnel
    rows = [
        (1, 1, "click", 10.0),
        (1, 2, "view", 1.0),
        (1, 3, "view", 2.0),
        (1, 4, "purchase", 100.0),
        (1, 5, "click", 20.0),
        (1, 6, "purchase", 200.0),
        (2, 1, "view", 1.0),
        (2, 2, "view", 1.0),
        (2, 3, "view", 1.0),
    ]
    return spark.createDataFrame(rows, "uid bigint, seq bigint, t string, v double")


def _measures(df, pattern, skip="past_last_row"):
    return match_recognize_measures(
        df,
        partition_by=["uid"],
        order_by=["seq"],
        symbols=SYMBOLS(),
        pattern=pattern,
        measures={
            "first_seq": ("first", "seq"),
            "last_seq": ("last", "seq"),
            "n_rows": ("count", None),
            "sum_v": ("sum", "v"),
            "max_v": ("max", "v"),
        },
        output_schema=(
            "uid bigint, match_no bigint, classifier string, "
            "first_seq bigint, last_seq bigint, n_rows bigint, "
            "sum_v double, max_v double"
        ),
        after_match_skip=skip,
    )


def test_measures_per_match(spark, seq_df):
    got = {
        (r.uid, r.match_no): (r.classifier, r.first_seq, r.last_seq, r.n_rows, r.sum_v, r.max_v)
        for r in _measures(seq_df, "cv*p").collect()
    }
    assert got == {
        (1, 1): ("cvvp", 1, 4, 4, 113.0, 100.0),
        (1, 2): ("cp", 5, 6, 2, 220.0, 200.0),
    }


def test_skip_policies_differ_on_runs(spark, seq_df):
    # 'vv' over user 2's run of 3 views: overlapping scan -> 2 matches at
    # seq 1-2 and 2-3; non-overlapping -> 1 match.
    nxt = _measures(seq_df, "vv", skip="to_next_row").filter("uid = 2").collect()
    past = _measures(seq_df, "vv", skip="past_last_row").filter("uid = 2").collect()
    assert [(r.first_seq, r.last_seq) for r in sorted(nxt, key=lambda r: r.match_no)] == [
        (1, 2),
        (2, 3),
    ]
    assert [(r.first_seq, r.last_seq) for r in past] == [(1, 2)]


def test_measures_agree_with_core_counts(spark, seq_df):
    core = {
        r.uid: r.n_matches
        for r in match_recognize(
            seq_df, ["uid"], ["seq"], SYMBOLS(), "cv*p"
        ).collect()
    }
    meas = (
        _measures(seq_df, "cv*p")
        .groupBy("uid")
        .count()
        .collect()
    )
    assert {r.uid: r["count"] for r in meas} == {
        u: n for u, n in core.items() if n > 0
    }


def test_rejects_bad_inputs(spark, seq_df):
    with pytest.raises(ValueError, match="empty"):
        _measures(seq_df, "v*")
    with pytest.raises(ValueError, match="SKIP"):
        _measures(seq_df, "vv", skip="to_last_symbol")
    with pytest.raises(ValueError, match="measure"):
        match_recognize_measures(
            seq_df, ["uid"], ["seq"], SYMBOLS(), "vv",
            measures={"x": ("median", "v")}, output_schema="uid bigint",
        )


def test_skip_to_symbol_scan():
    import re

    from ytsaurus_spark.operators.match_recognize import _scan_matches

    rx = re.compile("cv+")
    # c at 0, views 1-3; to_last v resumes AT index 3 -> no second c-match
    assert _scan_matches(rx, "cvvvp", ("to_last", "v")) == [(0, 4)]
    # two anchors: cvv starting at 0, resume at 2 (last v), next c at 3
    assert _scan_matches(rx, "cvvcv", ("to_last", "v")) == [(0, 3), (3, 5)]
    # to_first v of "cv+" resumes at the first v (index 1 of match)
    assert _scan_matches(rx, "cvvcv", ("to_first", "v")) == [(0, 3), (3, 5)]
    # vv overlapping via to_last
    assert _scan_matches(re.compile("vv"), "vvvv", ("to_last", "v")) == [
        (0, 2), (1, 3), (2, 4),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not advance"):
        _scan_matches(re.compile("vv"), "vvv", ("to_first", "v"))
    with _pytest.raises(ValueError, match="not present"):
        _scan_matches(re.compile("c"), "cv", ("to_last", "v"))


def test_skip_to_symbol_validation(spark):
    from ytsaurus_spark.operators.match_recognize import match_recognize_measures

    df = spark.createDataFrame([(1, 1, "a")], "k bigint, o bigint, t string")
    with pytest.raises(ValueError, match="unsupported AFTER MATCH SKIP"):
        match_recognize_measures(
            df, ["k"], ["o"], [("a", F.col("t") == "a")], "a",
            {"n": ("count", None)}, "k bigint, match_no bigint, classifier string, n bigint",
            after_match_skip=("to_somewhere", "a"),
        )


def test_all_rows_per_match(spark):
    from ytsaurus_spark.operators.match_recognize import match_recognize_rows

    df = spark.createDataFrame(
        [(1, 1, "c"), (1, 2, "p"), (1, 3, "c"), (1, 4, "c"), (1, 5, "p"),
         (2, 1, "p"), (2, 2, "c")],
        "k bigint, o bigint, t string",
    )
    out = match_recognize_rows(
        df, ["k"], ["o"],
        [("c", F.col("t") == "c"), ("p", F.col("t") == "p")],
        "cp", keep_cols=["o"],
        output_schema="k bigint, o bigint, match_no bigint, classifier string, row_in_match bigint",
    ).collect()
    got = {(r.k, r.o): (r.match_no, r.classifier, r.row_in_match) for r in out}
    assert got[(1, 1)] == (1, "c", 1)
    assert got[(1, 2)] == (1, "p", 2)
    assert got[(1, 4)] == (2, "c", 1)
    assert got[(1, 5)] == (2, "p", 2)
    assert (1, 3) not in got and len(out) == 4  # key 2 has no match
