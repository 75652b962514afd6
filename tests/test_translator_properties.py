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
