"""YQL dialect conformance queries: the reference's OWN benchmark SQL files
run VERBATIM through the dialect shim (ytsaurus_spark/yql) — the proof that
a user can paste YQL text (named ``$expr`` bindings, backticked
identifiers, optional AS, PRAGMA headers, ``Module::Function`` calls) and
get the right answer from this engine.

Each entry reads ``yt/benchmarks/run/queries/NN.sql`` unmodified from the
reference checkout at import time, translates it (translate_yql_script:
named bindings → WITH chains, scalar/IN ``$refs`` → subqueries, YQL-only
spellings → portable SQL), and:

- Spark side: executes the translated text against the derived TPC-DS star
  views (yql/tpcds_star.py) in a cached isolated session;
- oracle side: the SAME translated text wrapped in main-qualified star
  CTEs, so DuckDB recomputes the identical semantics from the base
  fixtures.

Registered set = every statement that passes the STRICT dual-engine
compare at BOTH sf0.01 and sf0.1 (tools/yql_conformance.py sweeps all 99
files): 91 of 101 statements. The 10 exclusions, by reason:

- LIMIT-tie nondeterminism (05, 22, 27, 67): ORDER BY keys that are not
  a total order, so the two engines legitimately pick different rows at
  the LIMIT boundary;
- Spark's documented ROLLUP-over-empty-input divergence (14a, 18, 80):
  ANSI/DuckDB emit the grand-total row over an empty selection, Spark
  emits nothing (COVERAGE.md Known gaps — opt-in shim exists as
  aggregates.ansi_rollup but the verbatim text can't opt in);
- position-0 substring divergence (08): ``substring(zip, 0, 5)`` yields
  5 chars on Spark (0 clamps to 1) but 4 on DuckDB (position 0 sits
  before the first char), so the zip group keys differ;
- NULL-ordering divergence under LIMIT (77): the ROLLUP's NULL subtotal
  keys sort NULLS FIRST on Spark and NULLS LAST on DuckDB, selecting
  different top-100 sets;
- division-by-zero semantics (75): a prior-year amount of 0 raises
  under Spark's ANSI mode while DuckDB's double division yields inf;
- DECIMAL literal/typing divergence in output columns (83, 90).

Multi-result scripts (14, 23, 24, 39) register one entry per statement
with an a/b suffix. If the reference checkout is absent (standalone use),
these conformance entries skip registration; the shim itself
(yql.yql_select) needs no reference files.

(35/38/87 — unaliased aggregate output names printing
engine-specifically — were closed in round 7 by positional-name
normalization on BOTH engines; q58 — DuckDB ORDER-BY binder strictness,
not an engine-value divergence — by an oracle-side disambiguation. See
_POSITIONAL_NAMES/_ORACLE_FIXES below.)

Substance note (measured at sf0.1): 51 of the first 87 registered statements
return rows; the 36 empty results are honest — their verbatim predicates
reference dates beyond the fixture's 1995-2001 range (e.g. q98's
2002-01-05 window) or conjunctions the synthetic star never satisfies,
and BOTH engines agree on empty. The derivations deliberately land the
common literal domains (category names, dollar price bands, bench zip
lists, months-since-1900 d_month_seq) so the majority select real data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ytsaurus_spark.queries import register

_BENCH_DIR = "/root/reference/yt/benchmarks/run/queries"

# statement ids passing the strict dual-engine sweep at sf0.01 AND sf0.1
# (see module docstring for the 11 exclusions); 'NN' = single-statement
# file, 'NNa'/'NNb' = statement within a multi-result script
_PASSING = (
    "01", "02", "03", "04", "06", "07", "09", "10", "11", "12",
    "13", "14b", "15", "16", "17", "19", "20", "21", "23a", "23b",
    "24a", "24b", "25", "26", "28", "29", "30", "31", "32", "33", "34",
    "36", "37", "39a", "39b", "40", "41", "42", "43", "44", "45", "46",
    "47", "48", "49", "50", "51", "52", "53", "54", "55", "56", "57",
    "59", "60", "61", "62", "63", "64", "65", "66", "68", "69", "70",
    "71", "72", "73", "74", "76", "78", "79", "81", "82", "84",
    "85", "86", "88", "89", "91", "92", "93", "94", "95", "96", "97",
    "98", "99",
    # closed in round 7 via positional-name normalization (below)
    "35", "38", "87",
    # closed in round 7 via an oracle-side ORDER BY disambiguation (below)
    "58",
)

# Statements whose VALUES are engine-identical but whose UNALIASED
# aggregate output columns print engine-specifically (Spark
# `avg(cd_dep_count)` vs DuckDB `avg(customer_demographics.cd_dep_count)`,
# `count(*)` vs `count_star()`), which the sorted-by-name compare turns
# into a false mismatch. Both engines get the SAME positional names
# (c00..cNN) — presentation-layer normalization only: the verbatim text
# still runs unmodified on both engines, values and column ORDER are
# untouched. q35's LIMIT is tie-free (it orders by all six group keys).
_POSITIONAL_NAMES = {"35": 18, "38": 1, "87": 1}

# ORACLE-side-only textual fixes for DuckDB binder strictness where Spark
# and the SQL standard resolve fine: q58's `ORDER BY item_id` names the
# single OUTPUT column (aliased from ss_items.item_id), but DuckDB binds
# ORDER BY in the input scope first and reports ambiguity across the three
# joined item_id inputs. The replacement names the very column the output
# aliases — semantics identical, applied ONLY to the DuckDB recomputation
# (the verbatim text still runs unmodified on Spark).
_ORACLE_FIXES = {
    "58": [("order by item_id", "order by ss_items.item_id")],
}


def _register_statement(qid: str, text: str, part: int, n_parts: int) -> None:
    from ytsaurus_spark.yql import oracle_with_star
    from ytsaurus_spark.yql.dialect import translate_yql_script

    tq = translate_yql_script(text)[part]
    oracle = oracle_with_star(tq.sql)
    for pat, rep in _ORACLE_FIXES.get(qid, []):
        assert pat in oracle, (qid, pat)
        oracle = oracle.replace(pat, rep)
    cols = None
    if qid in _POSITIONAL_NAMES:
        cols = [f"c{i:02d}" for i in range(_POSITIONAL_NAMES[qid])]
        oracle = f"SELECT * FROM (\n{oracle}\n) AS t({', '.join(cols)})"

    @register(f"yql_q{qid}", oracle)
    def run(spark: SparkSession, sf_dir: str,
            _text: str = text, _part: int = part, _cols: "list[str] | None" = cols) -> DataFrame:
        """Verbatim reference bench statement (yt/benchmarks/run/queries)
        through the YQL dialect shim: translate -> cached isolated star
        session -> spark.sql. CROSS JOIN + WHERE equality folds to
        broadcast hash joins (dims are dim-sized); money columns are
        integer cents so every sum is engine-exact."""
        from ytsaurus_spark.yql import _star_session
        from ytsaurus_spark.yql.dialect import translate_yql_script

        parts = translate_yql_script(_text)
        out = _star_session(spark, sf_dir).sql(parts[_part].sql)
        if _cols is not None:
            out = out.toDF(*_cols)
        return out


def _load_all() -> None:
    if not os.path.isdir(_BENCH_DIR):  # standalone checkout: skip
        return
    texts: dict[str, str] = {}
    for qid in _PASSING:
        fnum = qid.rstrip("ab")
        if fnum not in texts:
            path = os.path.join(_BENCH_DIR, f"{fnum}.sql")
            with open(path, encoding="utf-8") as fh:
                texts[fnum] = fh.read()
        part = 0 if qid == fnum else ord(qid[-1]) - ord("a")
        n_parts = 2 if qid != fnum else 1
        _register_statement(qid, texts[fnum], part, n_parts)


_load_all()
