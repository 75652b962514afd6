"""Hand-optimized TPC-DS variants (queries/yql_opt_q.py): registry
wiring and the pinned q92 non-equivalence finding."""

from __future__ import annotations

import os

import pytest

_OPT_DIR = "/root/reference/yt/benchmarks/run/queries_optimized"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_OPT_DIR), reason="reference checkout not present"
)


def test_all_variants_registered():
    from ytsaurus_spark.queries import all_oracles, all_queries

    qs, oracles = all_queries(), all_oracles()
    names = [k for k in qs if k.startswith("yql_o")]
    assert len(names) == 24
    # every registered variant has an oracle (differential or self)
    assert all(n in oracles and oracles[n] for n in names)


def test_q92_divergence():
    """The reference's own optimized 92.sql drops the original's
    ``i_manufact_id = 356`` predicate — it is NOT a semantics-preserving
    rewrite. This test pins the finding so a reference update that fixes
    the file flips yql_o92 back to a differential oracle."""
    orig = open(
        "/root/reference/yt/benchmarks/run/queries/92.sql",
        encoding="utf-8",
    ).read()
    opt = open(os.path.join(_OPT_DIR, "92.sql"), encoding="utf-8").read()
    assert "i_manufact_id" in orig
    assert "i_manufact_id" not in opt


def test_optimized_runs_and_matches_original(spark, sf_dir):
    # one representative end-to-end differential at fixture scale
    from ytsaurus_spark.yql import _star_session
    from ytsaurus_spark.yql.dialect import translate_yql_script

    s2 = _star_session(spark, sf_dir)
    rows = {}
    for d in ("queries", "queries_optimized"):
        text = open(
            f"/root/reference/yt/benchmarks/run/{d}/15.sql", encoding="utf-8"
        ).read()
        df = s2.sql(translate_yql_script(text)[0].sql)
        rows[d] = sorted(map(tuple, df.collect()))
    assert rows["queries"] == rows["queries_optimized"]
