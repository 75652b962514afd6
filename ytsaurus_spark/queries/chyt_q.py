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
    import re

    from ytsaurus_spark.chyt import resolve_if_defaults, translate_chyt

    # DuckDB-ize the translated text: minIf/maxIf default markers resolve
    # to the numeric fallback (every registered *If here is numeric), and
    # Spark's truncating integer division `DIV` is spelled `//` in DuckDB.
    oracle = resolve_if_defaults(translate_chyt(text))
    oracle = re.sub(r"\bDIV\b", "//", oracle)

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


# --- round-8 breadth: YSON/YPath functions, GLOBAL JOIN, casts, misc --------

_GLOBAL_JOIN_TEXT = """
select n_name, CAST(count(*) AS BIGINT) as n_customers,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) as acctbal_cents
from "//home/tpch/customer" c
global join "//home/tpch/nation" n on c.c_nationkey = n.n_nationkey
where isNotNull(c_mktsegment) and c_mktsegment != 'MACHINERY'
group by n_name
order by n_name
"""

_ANY_MISC_TEXT = """
select o_orderstatus,
       any(o_orderpriority) is not null as has_any,
       CAST(modulo(count(*), 1000) AS BIGINT) as n_mod,
       CAST(intDiv(count(*), 7) AS BIGINT) as n_div,
       ifNull(max(if(o_totalprice > 400000e0, o_totalprice, NULL)), 0e0) as m
from "//home/tpch/orders"
group by o_orderstatus
order by o_orderstatus
"""

_UINT64_TEXT = """
select toUInt64('18446744073709551615') as u_max,
       toUInt64(o_orderkey) as u_key
from "//home/tpch/orders"
order by o_orderkey
limit 5
"""

_make(
    "chyt_global_join",
    _GLOBAL_JOIN_TEXT,
    "GLOBAL JOIN (test_join_and_in.py): CHYT evaluates the right side "
    "once on the initiator and ships it to all workers "
    "(storage_distributor.cpp) — translated to a Spark BROADCAST hint "
    "on the dimension side (the hint rides in a comment the DuckDB "
    "oracle ignores). isNotNull is the CH spelling for IS NOT NULL.",
)
_make(
    "chyt_any_misc",
    _ANY_MISC_TEXT,
    "ClickHouse function spellings: any() -> any_value (first-value "
    "aggregate, NOT Spark's bool_or), modulo/intDiv arithmetic, "
    "ifNull -> coalesce, if -> CASE.",
)
_make(
    "chyt_uint64_cast",
    _UINT64_TEXT,
    "toUInt64 keeps the repo's DECIMAL(20,0) uint64 discipline: "
    "18446744073709551615 = 2^64-1 is a legal ClickHouse uint64 and "
    "must survive the cast (a BIGINT cast would overflow).",
)


@register(
    "chyt_yson_literals",
    """
    SELECT CAST(5 AS BIGINT) AS i1, 'Object' AS t_obj, 'Array' AS t_arr,
           CAST(3 AS BIGINT) AS len_arr, 'xyz' AS s_path,
           '{"key"=[1;2;];}' AS y_text, CAST(1 AS BOOLEAN) AS has_a,
           CAST(4.4 AS DOUBLE) AS f3
    """,
)
def chyt_yson_literals(spark, sf_dir):
    """YSON literal accessors (test_common.py::test_yson_extract,
    test_yson_functions.py::test_const_args, test_convert_yson): the
    YSONExtract*/YSONType/YSONLength/YSONHas family over text-YSON
    literals, YPathString path walking, ConvertYson text re-emission.
    Oracle = the reference tests' expected constants."""
    from ytsaurus_spark.chyt import chyt_query

    return chyt_query(spark, """
        select YSONExtractInt('{a=5;b=[5; 4; 3]}', 'b', 1) as i1,
               YSONType('{a=5}') as t_obj,
               YSONType('[1; 3; 4]') as t_arr,
               YSONLength('{a=5;b=[5; 4; 3]}', 'b') as len_arr,
               YPathString('{a=[1;2;{b=xyz}]}', '/a/2/b') as s_path,
               ConvertYson('{key=[1;2]}', 'text') as y_text,
               YSONHas('{a=5;b=6}', 'a') as has_a,
               YSONExtractFloat('[1; 2; 4.4]', 3) as f3
    """, sf_dir=sf_dir)


@register(
    "chyt_ypath_any_column",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def chyt_ypath_any_column(spark, sf_dir):
    """YPathInt64 over an Any column (test_yson_functions.py::
    test_read_int64_non_strict): the same pandas-UDF getter family works
    over the fixtures' JSON-encoded Any payloads (the repo's storage
    convention, functions/ql.py) — sniffed per value, Arrow-batched."""
    from ytsaurus_spark.chyt import chyt_query

    return chyt_query(spark, """
        select event_id, YPathInt64(props, '/k') as k_val
        from "//home/x/events"
        where YPathInt64(props, '/k') > 90
    """, sf_dir=sf_dir)


@register(
    "chyt_array_hofs",
    """
    SELECT CAST(12 AS DOUBLE) AS s, 20 AS last_el, CAST(2 AS BIGINT) AS idx,
           ['a', 'b', 'c'] AS parts
    """,
)
def chyt_array_hofs(spark, sf_dir):
    """ClickHouse array function spellings: arrayMap/arraySum (lambda
    FIRST in CH, second in Spark), arrayElement (1-based, negative from
    end — both engines agree), indexOf -> array_position with CH's
    0-for-missing, splitByChar (separator first, regex-quoted)."""
    from ytsaurus_spark.chyt import chyt_query

    return chyt_query(spark, """
        select arraySum(arrayMap(x -> x * 2, array(1, 2, 3))) as s,
               arrayElement(array(10, 20), -1) as last_el,
               indexOf(array(5, 6), 6) as idx,
               splitByChar('.', 'a.b.c') as parts
    """, sf_dir=sf_dir)


@register(
    "chyt_numbers_fn",
    "SELECT CAST(4950 AS BIGINT) AS s, CAST(100 AS BIGINT) AS n",
)
def chyt_numbers_fn(spark, sf_dir):
    """numbers(N) table function (test_common.py) -> spark.range: a
    metadata-only generated relation, no data scan."""
    from ytsaurus_spark.chyt import chyt_query

    return chyt_query(
        spark,
        "select sum(number) as s, CAST(count(*) AS BIGINT) as n "
        "from numbers(100)",
        sf_dir=sf_dir,
    )
