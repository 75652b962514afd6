"""CHYT (ClickHouse-over-YT) SQL dialect shim: run CHYT-style query text
on Spark — the third user surface next to QL (operators/select_rows.py)
and YQL (yql/).

Reference: CHYT executes stock ClickHouse SQL with YT tables as storage
(yt/chyt/server/storage_distributor.cpp:227-360 fans secondary queries;
granule_min_max_filter.cpp:24-83 prunes by chunk stats — Parquet
row-group stats + Catalyst predicate pushdown give the same skipping
declaratively). Its tests (yt/chyt/tests/server/test_common.py) write
queries like::

    select key1, key2, sum(value) from "//tmp/t" group by key1, key2
    select * from concatYtTablesRange('//tmp/dir') order by i

This shim translates the CHYT-specific surface onto Spark SQL:

- **double-quoted cypress paths** ``"//home/x/t"`` as table refs →
  the registered basename view (YtClient resolution when given);
- **concatYtTables / concatYtTablesRange / concatYtTablesRegexp** table
  functions (test_common.py:628-665) → a client-resolved UNION ALL of
  the member tables (the metadata-only concatenate analog);
- **PREWHERE** → folded into WHERE (``PREWHERE a WHERE b`` → WHERE
  ``(a) AND (b)``): PREWHERE is ClickHouse's manual pushdown hint, and
  Catalyst pushes every conjunct to the scan unconditionally;
- **ClickHouse function spellings** → portable SQL (countIf/sumIf/avgIf
  → conditional aggregates, uniqExact → count(distinct), toYYYYMM /
  toYear / toMonth / toDayOfMonth / toDate date parts, if/multiIf →
  CASE) or Spark builtins (cityHash64 → xxhash64 — same non-bit-compat
  note as farm_hash, arrayJoin → explode, uniq → approx_count_distinct);
- a trailing **FORMAT <X>** clause is stripped (wire-format directive).

Everything else ClickHouse shares with ANSI SQL parses on Spark as-is.
"""

from __future__ import annotations

import re

from ytsaurus_spark.yql.dialect import _split_call_args

__all__ = ["translate_chyt", "chyt_query"]


# CH name (lowercased) -> format template over positional args.
# "portable" rows translate onto the Spark/DuckDB shared surface (the
# oracle-checkable tier); "spark" rows use Spark-only builtins.
_CH_FUNCS: dict[str, str] = {
    # conditional aggregates (ClickHouse's *If combinators)
    # ClickHouse *If combinators return the TYPE DEFAULT (0) when no row
    # matches, not NULL — coalesce matches that. avgIf returns nan on an
    # empty match set; we keep NULL there (documented divergence: NULL is
    # the SQL-portable spelling and DuckDB agrees).
    "countif": "CAST(sum(CASE WHEN {0} THEN 1 ELSE 0 END) AS BIGINT)",
    "sumif": "coalesce(sum(CASE WHEN {1} THEN {0} END), 0)",
    "avgif": "avg(CASE WHEN {1} THEN {0} END)",
    "minif": "coalesce(min(CASE WHEN {1} THEN {0} END), 0)",
    "maxif": "coalesce(max(CASE WHEN {1} THEN {0} END), 0)",
    "uniqexact": "count(DISTINCT {0})",
    # date parts
    "toyear": "CAST(year({0}) AS INT)",
    "tomonth": "CAST(month({0}) AS INT)",
    "todayofmonth": "CAST(day({0}) AS INT)",
    "tohour": "CAST(hour({0}) AS INT)",
    "toyyyymm": "CAST(year({0}) * 100 + month({0}) AS INT)",
    "todate": "CAST({0} AS DATE)",
    "tostartofmonth": "CAST(date_trunc('month', {0}) AS DATE)",
    # control flow
    "if": "CASE WHEN {0} THEN {1} ELSE {2} END",
    # argMax/argMin: value of arg0 at the extremum of arg1 (max_by is
    # the shared Spark/DuckDB spelling)
    "argmax": "max_by({0}, {1})",
    "argmin": "min_by({0}, {1})",
    # explicit integer casts — uint64 keeps the repo's DECIMAL(20,0)
    # discipline (yt_types.py): values in [2^63, 2^64) are legal CH
    # uint64 and overflow BIGINT
    "touint64": "CAST({0} AS DECIMAL(20,0))",
    "toint64": "CAST({0} AS BIGINT)",
    "touint32": "CAST({0} AS INT)",
    "toint32": "CAST({0} AS INT)",
    "tofloat64": "CAST({0} AS DOUBLE)",
    "tostring": "CAST({0} AS STRING)",
    # spark-only tier
    "cityhash64": "xxhash64({0})",  # stable 64-bit hash; NOT bit-compatible
    "farmhash64": "xxhash64({0})",
    "uniq": "approx_count_distinct({0})",
    "arrayjoin": "explode({0})",
    "has": "array_contains({0}, {1})",
    "grouparray": "collect_list({0})",
    "groupuniqarray": "collect_set({0})",
    "empty": "(length({0}) = 0)",
    "notempty": "(length({0}) > 0)",
    # array higher-order functions: ClickHouse puts the lambda FIRST
    # (arrayMap(x -> x + 1, arr)); Spark's transform/filter take it
    # SECOND — same `x -> expr` lambda syntax on both sides
    "arraymap": "transform({1}, {0})",
    "arrayfilter": "filter({1}, {0})",
    "arraysum": "aggregate({0}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)",
    "arraysort": "array_sort({0})",
    "arraydistinct": "array_distinct({0})",
}

_CH_CALL = re.compile(r"\b([A-Za-z_]\w*)\s*\(")
_PATH_REF = re.compile(r'"(//[^"\[\]]+)"')
_CONCAT_FN = re.compile(
    r"(?i)\bconcatYtTables(Range|Regexp)?\s*\(", re.IGNORECASE
)
_FORMAT_TAIL = re.compile(r"(?is)\s+format\s+\w+\s*;?\s*$")
_CLAUSE_KW = (
    "where", "group by", "order by", "limit", "having",
    "union", "settings", "window", "qualify",
)


def _clause_end(s: str, keywords=_CLAUSE_KW) -> int:
    """Index in ``s`` where the current top-level clause body ends: the
    next clause keyword at paren-depth 0 outside string literals, else
    len(s). Depth-aware so subqueries inside the predicate don't cut."""
    kw = re.compile(
        "(?is)\\b(" + "|".join(k.replace(" ", "\\s+") for k in keywords) + ")\\b"
    )
    depth, i = 0, 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "'":
            j = i + 1
            while j < len(s) and s[j] != "'":
                j += 1
            i = j
        elif depth == 0 and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
            if kw.match(s, i):
                return i
        i += 1
    return len(s)


def _rewrite_ch_funcs(text: str) -> str:
    """Translate ClickHouse function spellings via _CH_FUNCS; unknown
    calls pass through (Spark shares most ANSI names)."""
    m = _CH_CALL.search(text)
    while m and m.group(1).lower() not in _CH_FUNCS:
        m = _CH_CALL.search(text, m.end())
    if not m:
        return text
    spec = _CH_FUNCS[m.group(1).lower()]
    open_idx = text.index("(", m.end() - 1)
    args, end = _split_call_args(text, open_idx)
    args = [_rewrite_ch_funcs(a.strip()) for a in args]
    # multiIf(c1, v1, c2, v2, ..., default) -> chained CASE
    try:
        replacement = spec.format(*args)
    except IndexError:
        raise ValueError(
            f"{m.group(1)} expects more arguments than {len(args)}"
        ) from None
    return text[: m.start()] + replacement + _rewrite_ch_funcs(text[end:])


def _rewrite_multiif(text: str) -> str:
    m = re.search(r"(?i)\bmultiIf\s*\(", text)
    if not m:
        return text
    open_idx = text.index("(", m.end() - 1)
    args, end = _split_call_args(text, open_idx)
    args = [a.strip() for a in args]
    if len(args) % 2 == 0 or len(args) < 3:
        raise ValueError("multiIf needs cond/value pairs plus a default")
    arms = "".join(
        f" WHEN {args[i]} THEN {args[i + 1]}" for i in range(0, len(args) - 1, 2)
    )
    case = f"CASE{arms} ELSE {args[-1]} END"
    return text[: m.start()] + case + _rewrite_multiif(text[end:])


def _fold_prewhere(text: str) -> str:
    """PREWHERE p [WHERE q] -> WHERE (p) AND (q) — ClickHouse evaluates
    PREWHERE before reading remaining columns; Catalyst pushes every
    conjunct to the scan, so the fold is semantics-preserving. BOTH
    predicates are parenthesized: 'PREWHERE p WHERE a OR b' must become
    'WHERE (p) AND (a OR b)', not '(p AND a) OR b'."""
    m = re.search(r"(?i)\bprewhere\b", text)
    if not m:
        return text
    rest = text[m.end():]
    cut = _clause_end(rest)
    pred, tail = rest[:cut].strip(), rest[cut:]
    mw = re.match(r"(?is)^where\b", tail)
    if mw:
        body = tail[mw.end():]
        cut2 = _clause_end(body, keywords=_CLAUSE_KW[1:])
        q = body[:cut2].strip()
        return (
            text[: m.start()]
            + f"WHERE ({pred}) AND ({q}) "
            + _fold_prewhere(body[cut2:])
        )
    return text[: m.start()] + f"WHERE ({pred}) " + _fold_prewhere(tail)


_SAMPLE = re.compile(r"(?is)\bsample\s+(0?\.\d+|1\.0|[0-9]+)\b")


def _rewrite_sample(text: str) -> str:
    """ClickHouse ``SAMPLE 0.1`` (fraction) / ``SAMPLE n`` (approx row
    count — unsupported: needs table stats) → Spark ``TABLESAMPLE``."""

    def sub(m: re.Match) -> str:
        v = m.group(1)
        if "." in v:
            return f"TABLESAMPLE ({float(v) * 100:g} PERCENT)"
        raise ValueError(
            "SAMPLE <rows> needs table statistics; use a fraction "
            "(SAMPLE 0.1) — Spark TABLESAMPLE is fraction/percent based"
        )

    return _SAMPLE.sub(sub, text)


def translate_chyt(text: str, resolve=None) -> str:
    """CHYT SQL text → Spark SQL text. ``resolve(path) -> table name``
    maps double-quoted cypress paths (defaults to the basename, the
    registered-view convention shared with the YQL shim)."""
    resolve = resolve or (lambda p: p.rstrip("/").rsplit("/", 1)[-1])
    text = _FORMAT_TAIL.sub("", text.strip().rstrip(";"))
    text = _PATH_REF.sub(lambda m: resolve(m.group(1)), text)
    text = _fold_prewhere(text)
    text = _rewrite_sample(text)
    text = _rewrite_multiif(text)
    return _rewrite_ch_funcs(text)


def chyt_query(spark, text: str, client=None, sf_dir: str | None = None):
    """Execute CHYT-style SQL and return the DataFrame. ``client`` (a
    YtClient) resolves cypress paths and the concatYtTables* table
    functions against its tree; ``sf_dir`` registers the fixture views
    in an isolated session (basename resolution, like yql_select)."""
    s2 = spark.newSession()
    if sf_dir is not None:
        from ytsaurus_spark.catalog import load_tables

        load_tables(s2, sf_dir)

    text = text.strip()
    m = _CONCAT_FN.search(text)
    if m:
        if client is None:
            raise ValueError("concatYtTables* needs a client to resolve")
        kind = (m.group(1) or "").lower()
        open_idx = text.index("(", m.end() - 1)
        args, end = _split_call_args(text, open_idx)
        args = [a.strip().strip("'\"") for a in args]
        from ytsaurus_spark.client import YtClient  # noqa: F401 (type)

        exec_client = type(client)(root=client.root, spark=s2)
        members = sorted(exec_client.list(args[0]))
        if kind == "range" and len(args) >= 2:
            lo = args[1]
            hi = args[2] if len(args) >= 3 else None
            members = [
                t for t in members
                if t >= lo and (hi is None or t <= hi)
            ]
        elif kind == "regexp" and len(args) >= 2:
            pat = re.compile(args[1].replace("*", ".*") + r"$")
            members = [t for t in members if pat.match(t)]
        if not members:
            raise ValueError(f"concatYtTables*: no tables under {args[0]}")
        union = None
        for t in members:
            df = exec_client.read_table(f"{args[0].rstrip('/')}/{t}")
            union = df if union is None else union.unionByName(df)
        union.createOrReplaceTempView("__chyt_concat")
        text = text[: m.start()] + "__chyt_concat" + text[end:]
    elif client is not None:
        exec_client = type(client)(root=client.root, spark=s2)
        for p in _PATH_REF.findall(text):
            if exec_client.exists(p):
                exec_client.read_table(p).createOrReplaceTempView(
                    p.rstrip("/").rsplit("/", 1)[-1]
                )
    return s2.sql(translate_chyt(text))


# --- write statements (CHYT mutations / DDL) ---------------------------------
# Reference: yt/chyt/tests/server/test_mutations.py — INSERT INTO
# "//path" [(cols)] VALUES ... | SELECT ..., with the rich-YPath
# <append=%false> attribute selecting overwrite; test_ddl.py — CREATE
# TABLE "//path"(col Type, ...) ENGINE YtTable(); DROP TABLE "//path".

_INSERT_RE = re.compile(
    r'(?is)^\s*insert\s+into\s+"(<append=%(?:false|true)>)?(//[^"]+)"'
    r"\s*(\(([^)]*)\))?\s*(values|select)\b(.*)$"
)
_CREATE_RE = re.compile(
    r'(?is)^\s*create\s+table\s+"(//[^"]+)"\s*\(([^)]*)\)'
    r"\s*engine\s*[= ]?\s*YtTable\s*\(\s*\)\s*$"
)
_DROP_RE = re.compile(r'(?is)^\s*drop\s+table\s+(if\s+exists\s+)?"(//[^"]+)"\s*$')

# ClickHouse column type -> Spark SQL type (uint64 keeps the repo's
# DECIMAL(20,0) discipline; see yt_types.py)
_CH_TYPES = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "uint8": "smallint", "uint16": "int",
    "uint32": "bigint", "uint64": "decimal(20,0)",
    "float32": "float", "float64": "double",
    "string": "string", "bool": "boolean", "boolean": "boolean",
    "date": "date", "datetime": "timestamp", "timestamp": "timestamp",
}


def chyt_execute(spark, text: str, client, sf_dir: str | None = None):
    """Execute a CHYT statement including mutations: INSERT INTO (VALUES
    or SELECT source; ``<append=%false>`` overwrites), CREATE TABLE …
    ENGINE YtTable(), DROP TABLE. Reads fall through to
    :func:`chyt_query`. Returns the result DataFrame for reads, None
    for writes."""
    stmt = text.strip().rstrip(";")

    m = _CREATE_RE.match(stmt)
    if m:
        cols = []
        for item in m.group(2).split(","):
            name, ch_type = item.split()[:2]
            t = _CH_TYPES.get(ch_type.lower())
            if t is None:
                raise ValueError(f"unsupported ClickHouse type {ch_type!r}")
            cols.append(f"{name} {t}")
        empty = spark.createDataFrame([], ", ".join(cols))
        client.write_table(m.group(1), empty, append=False)
        return None

    m = _DROP_RE.match(stmt)
    if m:
        if client.exists(m.group(2)):
            client.remove(m.group(2), recursive=True)
        elif not m.group(1):
            raise ValueError(f"DROP TABLE: {m.group(2)} does not exist")
        return None

    m = _INSERT_RE.match(stmt)
    if m:
        append_attr, path, _, cols, kind, rest = m.groups()
        append = append_attr != "<append=%false>"
        if kind.lower() == "values":
            df = spark.sql(f"SELECT * FROM VALUES{rest}")
        else:
            df = chyt_query(spark, f"select{rest}", client=client,
                            sf_dir=sf_dir)
        if cols:
            names = [c.strip() for c in cols.split(",")]
            df = df.toDF(*names)
            if client.exists(path):
                # partial-column insert: missing columns go NULL, cast
                # onto the stored schema
                from pyspark.sql import functions as F

                target = client.read_table(path)
                df = df.select(
                    *(
                        (F.col(c) if c in names else F.lit(None))
                        .cast(dict(zip(target.columns,
                                       [f.dataType for f in target.schema]))[c])
                        .alias(c)
                        for c in target.columns
                    )
                )
        elif client.exists(path):
            target = client.read_table(path)
            df = df.toDF(*target.columns)
        if not append and client.exists(path):
            # INSERT <append=%false> may SELECT from the table it
            # overwrites. Stage to a sibling path and atomically swap —
            # O(disk), unlike localCheckpoint which pins the whole
            # inserted dataset in executor storage memory (OOM at scale).
            from ytsaurus_spark.sources.formats import (
                table_attributes, _write_attrs,
            )

            staging = f"{path}.__chyt_staging"
            if client.exists(staging):
                client.remove(staging, recursive=True, force=True)
            prior = dict(table_attributes(client._fs(path)))
            client.write_table(staging, df, append=False)
            if prior:
                _write_attrs(client._fs(staging), prior)
            client.remove(path, recursive=True)
            client.move(staging, path)
        else:
            client.write_table(path, df, append=append)
        return None

    return chyt_query(spark, stmt, client=client, sf_dir=sf_dir)
