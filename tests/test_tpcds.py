"""TPC-DS-shaped suite: plan-shape gates for every ``tpcds_*`` query.

The reference's benchmark-as-test surface is all 99 TPC-DS queries
(``yt/benchmarks/run/queries/01.sql..99.sql``); correctness of each shape
is proven by the DuckDB oracle gate (`tools/check_oracle.py`).  These tests
pin the SCALE properties instead: no query in the suite may plan a global
(unpartitioned) window — the one shape that moves a whole input to a single
task — and the dim joins must broadcast rather than shuffle the fact side.
"""

from __future__ import annotations

import pytest

from ytsaurus_spark.plans import broadcast_join_count, unpartitioned_window_count
from ytsaurus_spark.queries import all_queries


def _tpcds_queries():
    return sorted(k for k in all_queries() if k.startswith("tpcds_"))


@pytest.mark.parametrize("name", _tpcds_queries())
def test_tpcds_no_global_window(spark, sf_dir, name):
    fn = all_queries()[name]
    df = fn(spark, sf_dir)
    assert unpartitioned_window_count(df) == 0, (
        f"{name} plans a global window — single-task sort at scale"
    )


def test_tpcds_dim_joins_broadcast(spark, sf_dir):
    # Spot-check the dim-join-heavy shapes: part/supplier/nation/customer
    # joins must be BroadcastHashJoin (fact side never shuffles on the dim
    # key).  q47 joins three dims, q36 one; both must broadcast them all.
    qs = all_queries()
    for name, expected in [
        ("tpcds_q47_yoy_deviation", 3),
        ("tpcds_q36_margin_hierarchy", 1),
    ]:
        df = qs[name](spark, sf_dir)
        assert broadcast_join_count(df) >= expected, name


def test_tpcds_suite_runs(spark, sf_dir):
    # Every tpcds query executes end-to-end at sf0.001 and yields a stable
    # schema (value correctness is the oracle gate's job).
    for name, fn in sorted(all_queries().items()):
        if not name.startswith("tpcds_"):
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
