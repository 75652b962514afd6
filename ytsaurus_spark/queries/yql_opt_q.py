"""The reference's HAND-OPTIMIZED TPC-DS variants, verbatim through the
YQL dialect — with a DIFFERENTIAL oracle.

The reference ships 24 hand-tuned rewrites of its TPC-DS bench queries
(``yt/benchmarks/run/queries_optimized/NN.sql``, selected over the
originals by ``common.py`` when ``--use-hand-optimized`` is set). Each
rewrite claims the ORIGINAL's semantics with a better plan shape (join
reorder, subquery flattening). That claim is itself checkable: every
``yql_oNN`` entry here runs the OPTIMIZED text on Spark while its oracle
is the ORIGINAL statement's translation on DuckDB — a three-way proof
(optimized-on-Spark == original-on-DuckDB, and the original is already
strict-checked by its ``yql_qNN`` sibling in yql_q.py).

Finding, pinned by test_yql_optimized.py::test_q92_divergence: the
reference's optimized ``92.sql`` DROPS the ``i_manufact_id = 356``
predicate present in the original — it is NOT semantics-preserving (the
original returns the discount sum for one manufacturer; the variant sums
over all items). ``yql_o92`` therefore oracles against its OWN text
(dual-engine check of the variant as written) instead of the original.
The user-facing writeup (patch-or-exclude guidance for anyone running
the reference bench with ``--use-hand-optimized``) is in MIGRATION.md
§"Known issue in the reference's own query set".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ytsaurus_spark.queries import register

_OPT_DIR = "/root/reference/yt/benchmarks/run/queries_optimized"
_ORIG_DIR = "/root/reference/yt/benchmarks/run/queries"

# 23 variants verified value-identical to their originals (sorted-row
# compare at sf0.001 and the oracle gate at sf0.01); 92 diverges (above).
_DIFFERENTIAL = (
    "04", "08", "11", "13", "15", "20", "32", "33", "40", "45", "47",
    "48", "49", "50", "53", "56", "57", "58", "59", "60", "63", "66",
    "72",
)

# DuckDB-binder fix shared with yql_q.py's original q58 (ORDER BY names
# the output column; DuckDB binds the input scope first and sees three
# candidate item_id inputs).
_ORACLE_FIXES = {
    "58": [("order by item_id", "order by ss_items.item_id")],
}


def _register(qid: str, differential: bool) -> None:
    from ytsaurus_spark.yql import oracle_with_star
    from ytsaurus_spark.yql.dialect import translate_yql_script

    with open(os.path.join(_OPT_DIR, f"{qid}.sql"), encoding="utf-8") as fh:
        opt_text = fh.read()
    if differential:
        with open(os.path.join(_ORIG_DIR, f"{qid}.sql"),
                  encoding="utf-8") as fh:
            oracle_src = fh.read()
    else:
        oracle_src = opt_text
    oracle = oracle_with_star(translate_yql_script(oracle_src)[0].sql)
    for pat, rep in _ORACLE_FIXES.get(qid, []):
        assert pat in oracle, (qid, pat)
        oracle = oracle.replace(pat, rep)

    @register(f"yql_o{qid}", oracle)
    def run(spark: SparkSession, sf_dir: str, _text: str = opt_text) -> DataFrame:
        """Verbatim hand-optimized reference bench statement
        (yt/benchmarks/run/queries_optimized) through the YQL dialect
        shim, differentially oracle-checked against the ORIGINAL
        statement's translation — the rewrite's semantics-preservation
        claim is the thing under test."""
        from ytsaurus_spark.yql import _star_session
        from ytsaurus_spark.yql.dialect import translate_yql_script

        parts = translate_yql_script(_text)
        return _star_session(spark, sf_dir).sql(parts[0].sql)


def _load_all() -> None:
    if not os.path.isdir(_OPT_DIR):  # standalone checkout: skip
        return
    for qid in _DIFFERENTIAL:
        _register(qid, differential=True)
    _register("92", differential=False)


_load_all()
