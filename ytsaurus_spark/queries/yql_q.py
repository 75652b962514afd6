"""YQL dialect conformance queries: the reference's OWN benchmark SQL files
run VERBATIM through the dialect shim (ytsaurus_spark/yql) — the proof that
a user can paste YQL text (named expressions, optional AS, PRAGMA headers)
and get the right answer from this engine.

Each entry reads ``yt/benchmarks/run/queries/NN.sql`` unmodified from the
reference checkout at import time, translates it (named ``$expr`` bindings
→ a WITH chain, ``$refs`` → CTE names, pragmas → recorded/applied), and:

- Spark side: executes the translated text against the derived TPC-DS star
  views (yql/tpcds_star.py) in an isolated session;
- oracle side: the SAME translated text wrapped in main-qualified star
  CTEs, so DuckDB recomputes the identical semantics from the base
  fixtures.

The star derivation (channel = l_linenumber % 3, money as integer cents,
date_sk = yyyymmdd, manufact/manager ids from p_partkey residues) is the
documented contract in yql/tpcds_star.py — the SQL text between the two
engines differs ONLY in the base-table qualifier.

If the reference checkout is absent (standalone use), these conformance
entries skip registration; the shim itself (yql.yql_select) needs no
reference files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ytsaurus_spark.queries import register

_BENCH_DIR = "/root/reference/yt/benchmarks/run/queries"

# files chosen to cover the dialect surface: 01 = two chained named
# expressions + explicit-join rewrite; 03/42/52/55 = optional-AS aliases,
# qualified GROUP BY, CROSS JOIN + WHERE equality, ORDER BY .. LIMIT with
# total tie-breaks (deterministic under the sorted-rows compare)
_FILES = ("01", "03", "42", "52", "55")


def _register_file(qnum: str, text: str) -> None:
    from ytsaurus_spark.yql import oracle_with_star, translate_yql

    tq = translate_yql(text)
    oracle = oracle_with_star(tq.sql)

    @register(f"yql_q{qnum}", oracle)
    def run(spark: SparkSession, sf_dir: str, _text: str = text) -> DataFrame:
        """Verbatim reference bench file yt/benchmarks/run/queries/{N}.sql
        through yql.yql_select: translate → isolated session → star views
        → spark.sql. The CROSS JOIN + WHERE equality form Catalyst folds
        to broadcast hash joins (dims are dim-sized); money columns are
        integer cents so every sum is exact on both engines."""
        from ytsaurus_spark.yql import yql_select

        return yql_select(spark, _text, sf_dir=sf_dir)

    run.__doc__ = (run.__doc__ or "").replace("{N}", qnum)


def _load_all() -> None:
    if not os.path.isdir(_BENCH_DIR):  # standalone checkout: skip
        return
    for qnum in _FILES:
        path = os.path.join(_BENCH_DIR, f"{qnum}.sql")
        with open(path, encoding="utf-8") as fh:
            _register_file(qnum, fh.read())


_load_all()
