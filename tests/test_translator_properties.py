"""Property-based tests (hypothesis) for the QL→Spark SQL translator —
invariants that must hold for ANY input, mirroring the reference's
randomized robustness testing style."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from ytsaurus_spark.operators.select_rows import (  # noqa: E402
    QLSyntaxError,
    translate_ql,
)

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
path_seg = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


@settings(max_examples=60, deadline=None)
@given(cols=st.lists(ident, min_size=1, max_size=4), segs=st.lists(path_seg, min_size=1, max_size=3))
def test_table_ref_resolves_to_basename(cols, segs):
    q = f"{', '.join(cols)} FROM [//{'/'.join(segs)}]"
    sql = translate_ql(q)
    assert sql.startswith("SELECT ")
    assert f"FROM {segs[-1]}" in sql
    assert "[" not in sql and "//" not in sql


@settings(max_examples=60, deadline=None)
@given(lit=st.text(alphabet=st.characters(blacklist_characters="'\\\n\r", max_codepoint=0x7E), max_size=30))
def test_quoted_literals_never_rewritten(lit):
    q = f"s FROM [//t] WHERE s = '{lit}'"
    sql = translate_ql(q)
    assert f"'{lit}'" in sql


@settings(max_examples=40, deadline=None)
@given(col=ident)
def test_order_by_without_limit_always_raises(col):
    with pytest.raises(QLSyntaxError):
        translate_ql(f"{col} FROM [//t] ORDER BY {col}")
    # and never raises once LIMIT is present
    translate_ql(f"{col} FROM [//t] ORDER BY {col} LIMIT 1")


@settings(max_examples=40, deadline=None)
@given(a=ident, b=ident)
def test_function_renames_only_at_word_boundaries(a, b):
    # a column merely *named* like a QL function must not be rewritten
    q = f"my_is_null, {a} FROM [//t] WHERE is_null({b})"
    sql = translate_ql(q)
    assert "my_is_null" in sql
    assert f"isnull({b})" in sql


# --- fold identities behind the round-6 monitoring operators ----------------


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
    ref=st.integers(min_value=0, max_value=10**9),
)
def test_cusum_reset_identity_property(xs, ref):
    """max(0, s+d) fold == cum − least(0, running-min(cum)) for ANY
    integer series — the identity the stream_cusum_monitor oracle rests
    on (pure-Python twin of the Spark/DuckDB computation)."""
    s, fold = 0, []
    for x in xs:
        s = max(0, s + (x - ref))
        fold.append(s)
    cum, mn, ident = 0, 0, []
    for x in xs:
        cum += x - ref
        mn = min(mn, cum)
        ident.append(cum - min(0, mn))
    assert fold == ident


@settings(max_examples=100, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=2, max_size=60),
)
def test_cusum_n_scaled_returns_to_zero(xs):
    """Σ(n·x_i − Σx) over the whole series is exactly 0 — the
    ts_cusum_changepoint checksum invariant, for any integer series."""
    n, s = len(xs), sum(xs)
    assert sum(n * x - s for x in xs) == 0


@settings(max_examples=100, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=10**6), min_size=8, max_size=60),
    lag=st.integers(min_value=0, max_value=5),
)
def test_lag_corr_shifted_series_moments_equal(xs, lag):
    """For y = x shifted by `lag`, the aligned lag-`lag` moments satisfy
    num == dx == dy exactly (perfect correlation in integer arithmetic)
    — the invariant behind ts_lag_corr's exactness claim."""
    pairs = [(xs[i], xs[i]) for i in range(len(xs) - lag)]
    n = len(pairs)
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    syy = sum(b * b for _, b in pairs)
    assert n * sxy - sx * sy == n * sxx - sx * sx == n * syy - sy * sy
