"""YQL table path functions and FLATTEN COLUMNS — context-aware text
expansions that run BEFORE the SQL translator.

Table path functions (reference: the YT provider's IO discovery,
yt/yql/providers/yt/provider/yql_yt_io_discovery.cpp:101 — MrTableRange/
MrTableRangeName/MrTableEach) read a cypress DIRECTORY as a union of its
member tables, the standard way to consume a date-partitioned log dir:

    SELECT * FROM RANGE(`//logs/app`, `2024-01-01`, `2024-01-31`)
    SELECT * FROM CONCAT(`//a`, `//b`)
    SELECT * FROM EACH('//a;//b')      -- explicit path list
    SELECT * FROM LIKE(`//logs`, 'app-%')
    SELECT * FROM REGEXP(`//logs`, 'app-\\d+')

Spark re-expression: expansion lists the directory through the YtClient
(a driver-side METADATA pass — no data moves), keeps only the member
tables selected by the range/pattern, registers each as a temp view, and
splices a parenthesized ``UNION ALL`` subquery into the statement. The
selection happens at the PATH level before any scan is planned — at
100 TB a RANGE over a year of daily tables reads only the asked-for days
(partition pruning by directory layout, the reference's own discipline).
``TablePath()`` / ``TableName()`` virtual functions (the usual
companions) become per-branch literal columns.

``FLATTEN COLUMNS`` (SQLv1Antlr4.g.in:548, select.cpp:1652) lifts every
top-level STRUCT column of the source into its members; it needs the
source schema, so the expansion resolves it through the session and
lowers to Spark's ``struct.*`` projection.
"""

from __future__ import annotations

import re

from ytsaurus_spark.yql.dialect import (
    YqlUnsupportedError,
    _depth_map,
    _split_call_args,
)

__all__ = ["expand_table_functions", "expand_flatten_columns"]

# backticked-path first arg: any of the six; quoted-string form only for
# RANGE/EACH (CONCAT('//x', y) is a legitimate scalar call — same
# discrimination as dialect._TABLE_FN_RE)
_TABLE_FN = re.compile(
    r"(?i)\b(range|concat|each|like|regexp|filter)\s*\(\s*`//"
    r"|\b(range|each)\s*\(\s*'//"
)
_VIRTUALS = re.compile(r"(?i)\btable(path|name)\s*\(\s*\)")
_TABLE_RECORD = re.compile(r"(?i)\btablerecord\s*\(\s*\)")


def _unq(tok: str) -> str:
    tok = tok.strip()
    if tok and tok[0] in "`'\"":
        return tok[1:-1]
    return tok


def _script_lambdas(text: str) -> dict:
    """Lambda named-expression bindings (``$f = ($x) -> (...)``) in the
    script — FILTER() callables resolve through these."""
    from ytsaurus_spark.yql.dialect import _LAMBDA_RE, split_statements

    out: dict[str, tuple[list[str], str]] = {}
    for stmt in split_statements(text):
        m = re.match(r"(?s)^\$(\w+)\s*=\s*(.+)$", stmt)
        if m is None:
            continue
        lm = _LAMBDA_RE.match(m.group(2).strip())
        if lm is None:
            continue
        params = re.findall(r"\$(\w+)", lm.group(1) or "")
        out[m.group(1)] = (params, (lm.group(2) or lm.group(3)).strip())
    return out


def _filter_names(names: list[str], fn_text: str, lambdas: dict,
                  spark) -> list[str]:
    """Evaluate a FILTER() lambda over the directory's table NAMES —
    one driver-side vectorized pass (the name list is a metadata-sized
    input: a year of daily tables is 365 rows, never data volume)."""
    from pyspark.sql import functions as F

    from ytsaurus_spark.yql.dialect import (
        _LAMBDA_RE,
        _expand_lambdas,
        _rewrite_module_funcs,
    )

    fn_text = fn_text.strip()
    rm = re.match(r"^\$(\w+)$", fn_text)
    if rm is not None:
        if rm.group(1) not in lambdas:
            raise YqlUnsupportedError(
                f"FILTER(): ${rm.group(1)} is not a lambda named "
                f"expression in this script"
            )
        params, body = lambdas[rm.group(1)]
    else:
        lm = _LAMBDA_RE.match(fn_text)
        if lm is None:
            raise YqlUnsupportedError(
                "FILTER() takes a one-argument lambda over table names — "
                "($name) -> (...) inline or a $lambda binding"
            )
        params = re.findall(r"\$(\w+)", lm.group(1) or "")
        body = (lm.group(2) or lm.group(3)).strip()
    if len(params) != 1:
        raise YqlUnsupportedError(
            "FILTER() lambda takes exactly one argument (the table name)"
        )
    expr = re.sub(rf"\${re.escape(params[0])}\b", "__tf_name", body)
    expr = _rewrite_module_funcs(_expand_lambdas(expr, lambdas))
    df = spark.createDataFrame([(n,) for n in names], "__tf_name string")
    return sorted(r[0] for r in df.where(F.expr(expr)).collect())


def _select_tables(fn: str, args: list[str], client,
                   lambdas: dict | None = None, spark=None) -> list[str]:
    """Resolve a table function call to the member-table paths it reads.
    Driver-side metadata only (client.list); selection happens here, at
    the path level, before any scan exists."""
    fn = fn.lower()
    if fn == "concat":
        paths = [_unq(a) for a in args]
        for p in paths:
            if not client.exists(p):
                raise ValueError(f"CONCAT: table {p} does not exist")
        return paths
    if fn == "each":
        # EACH takes a path list: quoted 'a;b' or multiple args
        paths: list[str] = []
        for a in args:
            paths.extend(x for x in _unq(a).split(";") if x)
        for p in paths:
            if not client.exists(p):
                raise ValueError(f"EACH: table {p} does not exist")
        return paths
    # directory-scanning family
    d = _unq(args[0]).rstrip("/")
    if not client.exists(d):
        raise ValueError(f"{fn.upper()}: directory {d} does not exist")
    names = sorted(client.list(d))
    if fn == "range":
        lo = _unq(args[1]) if len(args) > 1 and args[1].strip() else None
        hi = _unq(args[2]) if len(args) > 2 and args[2].strip() else None
        names = [n for n in names
                 if (lo is None or n >= lo) and (hi is None or n <= hi)]
    elif fn == "like":
        pat = _unq(args[1])
        rx = re.compile("".join(
            ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
            for ch in pat) + r"\Z")
        names = [n for n in names if rx.match(n)]
    elif fn == "regexp":
        rx = re.compile(_unq(args[1]))
        names = [n for n in names if rx.search(n)]
    else:  # filter — a YQL lambda evaluated over the NAME list
        if len(args) < 2:
            raise YqlUnsupportedError(
                "FILTER() takes (directory, lambda-over-table-names)"
            )
        names = _filter_names(names, args[1], lambdas or {}, spark)
    return [f"{d}/{n}" for n in names]


def _stmt_span(text: str, pos: int) -> tuple[int, int]:
    """(start, end) of the ';'-separated statement containing ``pos`` —
    semicolons inside parens/quotes don't split."""
    dm = _depth_map(text)
    bounds = [i for i, c in enumerate(text) if c == ";" and dm[i] == 0]
    start = 0
    end = len(text)
    for b in bounds:
        if b < pos:
            start = b + 1
        else:
            end = b
            break
    return start, end


def expand_table_functions(text: str, client, spark) -> str:
    """Expand every RANGE/CONCAT/EACH/LIKE/REGEXP table function call in
    ``text`` into a parenthesized UNION ALL over temp views registered
    from ``client``. ``TablePath()``/``TableName()`` become per-branch
    literals — decided PER STATEMENT, so one TablePath() use never widens
    expansions in other statements of the script. Idempotent on text
    without table functions."""
    out = text
    counter = 0
    lambdas = _script_lambdas(text)
    while True:
        m = _TABLE_FN.search(out)
        if m is None:
            return out
        fn = (m.group(1) or m.group(2)).lower()
        open_idx = out.index("(", m.start())
        args, end = _split_call_args(out, open_idx)
        if client is None:
            raise YqlUnsupportedError(
                f"YQL table path function {fn.upper()}() needs a "
                f"cypress context — pass a client to yql_execute "
                f"or yql_select"
            )
        paths = _select_tables(fn, [a.strip() for a in args], client,
                               lambdas=lambdas, spark=spark)
        if not paths:
            raise ValueError(
                f"{fn.upper()}: no tables match in {_unq(args[0])}"
            )
        ss, se = _stmt_span(out, m.start())
        stmt = out[ss:se]
        if _TABLE_RECORD.search(stmt):
            raise YqlUnsupportedError(
                "TableRecord() is not supported — select the columns "
                "explicitly (TablePath()/TableName() are available)"
            )
        wants_virtuals = bool(_VIRTUALS.search(stmt))
        branches = []
        for p in paths:
            view = f"__yql_tf{counter}"
            counter += 1
            client.read_table(p).createOrReplaceTempView(view)
            if wants_virtuals:
                name = p.rstrip("/").rsplit("/", 1)[-1]
                branches.append(
                    f"SELECT *, '{p}' AS _yql_table_path, "
                    f"'{name}' AS _yql_table_name FROM {view}"
                )
            else:
                branches.append(f"SELECT * FROM {view}")
        rep = "(" + " UNION ALL ".join(branches) + ")"
        out = out[: m.start()] + rep + out[end:]
        if wants_virtuals:
            ss, se = _stmt_span(out, m.start())
            stmt = out[ss:se]
            stmt = re.sub(r"(?i)\btablepath\s*\(\s*\)",
                          "_yql_table_path", stmt)
            stmt = re.sub(r"(?i)\btablename\s*\(\s*\)",
                          "_yql_table_name", stmt)
            out = out[:ss] + stmt + out[se:]


_FLATTEN_COLS = re.compile(
    r"(?is)\bfrom\s+(`[^`]+`|[A-Za-z_][\w.]*)(\s+(?:as\s+)?"
    r"([A-Za-z_]\w*))?\s+flatten\s+columns\b"
)


def expand_flatten_columns(text: str, resolve_schema) -> str:
    """Expand ``FROM src FLATTEN COLUMNS`` by projecting every top-level
    struct column to its members (``s.*``), leaving other columns as-is.
    ``resolve_schema(source_token)`` returns the source's StructType
    (session- or client-backed)."""
    from pyspark.sql.types import StructType

    while True:
        m = _FLATTEN_COLS.search(text)
        if m is None:
            return text
        src = m.group(1)
        schema = resolve_schema(src)
        exprs = [
            f"{f.name}.*" if isinstance(f.dataType, StructType) else f.name
            for f in schema.fields
        ]
        rep = f"from (select {', '.join(exprs)} from {src}) "
        if m.group(3):
            rep += f"as {m.group(3)} "
        text = text[: m.start()] + rep + text[m.end():]
