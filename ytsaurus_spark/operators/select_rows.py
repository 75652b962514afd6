"""QL ``SelectRows`` string surface → Spark SQL translation.

The reference's primary interactive API is
``SelectRows("a, sum(b) FROM [//path/t] WHERE c > 1 GROUP BY a ...")``
(ISelectRowsClient, yt/yt/client/api/dynamic_table_client.h:110; grammar
yt/yt/library/query/base/parser.ypp:244-268). QL differs from SQL in shape:

- no leading SELECT keyword — the query begins with the projection;
- table refs are bracketed Cypress paths ``[//home/t]``;
- ``ORDER BY`` REQUIRES ``LIMIT`` (query_preparer.cpp:1136 — top-k only);
- a small builtin function set with QL names (is_prefix, if_null, ...).

This is a *translator*, not an interpreter: the output string goes to
``spark.sql`` so Catalyst plans it — nothing here executes rows. Function
renames happen only at word boundaries outside string literals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class QLSyntaxError(ValueError):
    pass


# QL builtin name -> Spark SQL function (registry
# yt/yt/library/query/base/builtin_function_registry.cpp). Only renames are
# listed; same-name functions (lower, length, concat, coalesce, if, ...)
# pass through untouched.
_FN_RENAMES: dict[str, str] = {
    "is_null": "isnull",
    "if_null": "ifnull",
    "is_nan": "isnan",
    "is_substr": "__ql_is_substr",      # arg swap handled below
    "is_prefix": "__ql_is_prefix",
    "farm_hash": "xxhash64",
    "cardinality": "approx_count_distinct",
    "argmin": "min_by",
    "argmax": "max_by",
    "numeric_to_string": "string",
    "parse_int64": "bigint",
    "parse_double": "double",
    "regex_partial_match": "__ql_regex_partial",
    "regex_replace_all": "__ql_regex_replace_all",
    "format_timestamp": "date_format",
    "timestamp_floor_hour": "__ql_floor_hour",
    "timestamp_floor_day": "__ql_floor_day",
    "timestamp_floor_week": "__ql_floor_week",
    "timestamp_floor_month": "__ql_floor_month",
    "timestamp_floor_year": "__ql_floor_year",
}

# Two-arg helpers where QL argument order differs from the Spark builtin.
# Rewritten as SQL lambdas at translation time (still fully Catalyst-planned).
_HELPER_EXPANSIONS: dict[str, str] = {
    "__ql_is_substr": "contains({1}, {0})",
    "__ql_is_prefix": "startswith({1}, {0})",
    "__ql_regex_partial": "({1} rlike {0})",
    "__ql_regex_replace_all": "regexp_replace({1}, {0}, {2})",
    "__ql_floor_hour": "date_trunc('hour', {0})",
    "__ql_floor_day": "date_trunc('day', {0})",
    "__ql_floor_week": "date_trunc('week', {0})",
    "__ql_floor_month": "date_trunc('month', {0})",
    "__ql_floor_year": "date_trunc('year', {0})",
}

_TABLE_REF = re.compile(r"\[(//[^\]]+)\]")
_ORDER_BY = re.compile(r"\border\s+by\b", re.IGNORECASE)
_LIMIT = re.compile(r"\blimit\s+\d+", re.IGNORECASE)
# GROUP BY a, b WITH TOTALS → GROUP BY ROLLUP(a, b)'s grand-total row is the
# WITH TOTALS row; QL's BeforeHaving mode matches rollup-then-having.
_GROUP_TOTALS = re.compile(
    r"\bgroup\s+by\s+(.*?)\s+with\s+totals\b", re.IGNORECASE | re.DOTALL
)
# QL clause order is OFFSET n LIMIT m (parser.ypp:488-503); SQL wants
# LIMIT m OFFSET n.
_OFFSET_LIMIT = re.compile(
    r"\boffset\s+(\d+)\s+limit\s+(\d+)\b", re.IGNORECASE
)


def _split_literals(s: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, chunk) so rewrites never touch quoted text."""
    out: list[tuple[bool, str]] = []
    buf, i, n = [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            if buf:
                out.append((False, "".join(buf)))
                buf = []
            j = i + 1
            while j < n and s[j] != ch:
                j += 2 if s[j] == "\\" else 1
            out.append((True, s[i : min(j + 1, n)]))
            i = j + 1
        else:
            buf.append(ch)
            i += 1
    if buf:
        out.append((False, "".join(buf)))
    return out


def _rewrite_helpers(sql: str) -> str:
    """Expand __ql_* helper calls with positional args into Spark exprs."""
    for name, template in _HELPER_EXPANSIONS.items():
        while True:
            idx = sql.find(name + "(")
            if idx < 0:
                break
            depth, j, args, cur = 0, idx + len(name) + 1, [], []
            while j < len(sql):
                c = sql[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        args.append("".join(cur).strip())
                        break
                    depth -= 1
                elif c == "," and depth == 0:
                    args.append("".join(cur).strip())
                    cur = []
                    j += 1
                    continue
                cur.append(c)
                j += 1
            sql = sql[:idx] + template.format(*args) + sql[j + 1 :]
    return sql


def translate_ql(query: str, table_resolver=None) -> str:
    """QL query string → Spark SQL string."""
    q = query.strip()
    # ORDER BY requires LIMIT — same error the reference raises
    # (query_preparer.cpp:1136: "ORDER BY used without LIMIT").
    if _ORDER_BY.search(q) and not _LIMIT.search(q):
        raise QLSyntaxError("ORDER BY used without LIMIT in QL query")

    def resolve(m: re.Match) -> str:
        path = m.group(1)
        if table_resolver:
            return table_resolver(path)
        return path.rsplit("/", 1)[-1]  # basename = registered view name

    chunks = []
    for is_lit, chunk in _split_literals(q):
        if is_lit:
            chunks.append(chunk)
            continue
        chunk = _TABLE_REF.sub(resolve, chunk)
        for ql_name, spark_name in _FN_RENAMES.items():
            chunk = re.sub(rf"\b{ql_name}\s*\(", spark_name + "(", chunk)
        chunks.append(chunk)
    sql = "".join(chunks)
    sql = _GROUP_TOTALS.sub(lambda m: f"GROUP BY ROLLUP({m.group(1)})", sql)
    sql = _OFFSET_LIMIT.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", sql)
    sql = _rewrite_helpers(sql)
    if not re.match(r"^\s*select\b", sql, re.IGNORECASE):
        sql = "SELECT " + sql
    return sql


def select_rows(spark: SparkSession, query: str, table_resolver=None) -> DataFrame:
    """Run a QL query string. Tables must be registered as temp views (the
    catalog's register_all does this); ``[//any/path/name]`` resolves to the
    view ``name`` unless a custom resolver is given."""
    return spark.sql(translate_ql(query, table_resolver))
