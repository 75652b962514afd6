"""CHYT (ClickHouse-over-YT) SQL surface queries: ClickHouse-dialect
text through the chyt shim (ytsaurus_spark/chyt.py), oracle-checked by
running the TRANSLATED portable SQL on DuckDB over the same fixtures —
verifying the translation table, not just the engines. Reference surface:
yt/chyt/server/ (storage_distributor.cpp, query_analyzer.cpp) executes
stock ClickHouse SQL over YT tables; its tests
(yt/chyt/tests/server/test_common.py) are the query-shape source."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ytsaurus_spark.queries import register

_AGG_TEXT = """
select l_returnflag,
       countIf(l_discount > 0.05) as n_discounted,
       sumIf(l_quantity, l_linenumber = 1) as first_line_qty,
       uniqExact(l_orderkey) as n_orders
from "//home/tpch/lineitem"
group by l_returnflag
order by l_returnflag
FORMAT TabSeparated
"""

_DATE_TEXT = """
select toYYYYMM(o_orderdate) as ym,
       toYear(o_orderdate) as y,
       CAST(count(*) AS BIGINT) as n,
       minIf(o_totalprice, o_orderstatus = 'F') as min_f
from "//home/tpch/orders"
PREWHERE o_custkey % 10 = 3
group by toYYYYMM(o_orderdate), toYear(o_orderdate)
order by ym
"""

_PREWHERE_TEXT = """
select lang, CAST(count(*) AS BIGINT) as n,
       CAST(sum(n_chars) AS BIGINT) as chars
from "//home/x/documents"
PREWHERE n_chars > 200
WHERE lang != 'de'
group by lang
order by lang
"""


def _make(name: str, text: str, doc: str) -> None:
    from ytsaurus_spark.chyt import translate_chyt

    oracle = translate_chyt(text)

    @register(name, oracle)
    def run(spark: SparkSession, sf_dir: str, _text: str = text) -> DataFrame:
        from ytsaurus_spark.chyt import chyt_query

        return chyt_query(spark, _text, sf_dir=sf_dir)

    run.__doc__ = doc


_make(
    "chyt_agg_report",
    _AGG_TEXT,
    "ClickHouse *If combinators + uniqExact over the fact table: "
    "countIf/sumIf translate to conditional aggregates (map-side "
    "combinable — one shuffle), uniqExact to count(DISTINCT). The "
    "trailing FORMAT directive is stripped.",
)
_make(
    "chyt_date_parts",
    _DATE_TEXT,
    "ClickHouse date-part functions (toYYYYMM/toYear) + a *If aggregate, "
    "with PREWHERE folded into the scan predicate (ClickHouse's manual "
    "pushdown hint; Catalyst pushes every conjunct unconditionally — "
    "granule_min_max_filter.cpp:24-83 is the chunk-stat analog Parquet "
    "row groups give for free).",
)
_make(
    "chyt_prewhere_where",
    _PREWHERE_TEXT,
    "PREWHERE + WHERE compose by conjunction (test_prewhere.py "
    "semantics): both predicates reach the documents scan.",
)
