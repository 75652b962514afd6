"""QL ``SelectRows`` string surface → Spark SQL translation.

The reference's primary interactive API is
``SelectRows("a, sum(b) FROM [//path/t] WHERE c > 1 GROUP BY a ...")``
(ISelectRowsClient, yt/yt/client/api/dynamic_table_client.h:110; grammar
yt/yt/library/query/base/parser.ypp:244-268, lexer lexer.rl6). QL differs
from SQL in shape:

- no leading SELECT keyword — the query begins with the projection;
- table refs are bracketed Cypress paths ``[//home/t]``;
- ``ORDER BY`` REQUIRES ``LIMIT`` (query_preparer.cpp:1136 — top-k only);
- clause order is ``OFFSET n LIMIT m``;
- ``GROUP BY ... WITH TOTALS`` emits a grand-total row;
- ``[LEFT] ARRAY JOIN expr AS alias, ...`` flattens list columns in
  parallel (zip semantics — ast.h:485-502, parser.ypp:389-393);
- ``FROM [//t] WITH INDEX [//idx]`` routes the scan through a secondary
  index table (parser.ypp:360-369,
  yt/yt/library/query/secondary_index/transform.h:12);
- ``{name}`` placeholders are substituted from a value map
  (lexer.rl6:88, query_preparer.cpp:494 ConvertYsonPlaceholdersToQueryLiterals);
- ``JOIN ... USING a, b`` takes a bare identifier list (no parens);
- ``#`` is the null literal (YSON entity), ``123u`` an unsigned literal;
- a builtin function set with QL names
  (yt/yt/library/query/base/builtin_function_registry.cpp).

This is a *translator*, not an interpreter: the input is tokenized (so
string literals are never rewritten), the token stream is restructured
into ANSI SQL, and the output string goes to ``spark.sql`` so Catalyst
plans it — nothing here executes rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class QLSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<STR>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
    | (?P<TABLE>\[\s*//[^\]]+\])
    | (?P<PLACEHOLDER>\{[A-Za-z_][A-Za-z_0-9]*\})
    | (?P<NUM>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[uU]\b)?)
    | (?P<IDENT>[A-Za-z_][A-Za-z_0-9]*|`[^`]+`)
    | (?P<PUNCT><=|>=|!=|<>|\|\||<<|>>|[-+*/%(),.<>=\#&|~\[\]])
    | (?P<WS>\s+)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str  # STR NUM IDENT PUNCT TABLE PLACEHOLDER RAW
    text: str

    def is_kw(self, *words: str) -> bool:
        return self.kind == "IDENT" and self.text.lower() in words


def _tokenize(q: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise QLSyntaxError(f"cannot tokenize QL at: {q[pos:pos + 30]!r}")
        kind = m.lastgroup
        text = m.group()
        pos = m.end()
        if kind == "WS":
            continue
        if kind == "NUM" and text[-1] in "uU":
            text = text[:-1]  # unsigned suffix: value is the same digits
        if kind == "PUNCT" and text == "#":
            # YSON entity literal = null
            kind, text = Tok("IDENT", "NULL").kind, "NULL"
        out.append(Tok(kind, text))
    return out


def _render(tokens: list[Tok]) -> str:
    s = ""
    for t in tokens:
        txt = t.text
        if s and txt not in ("(", ")", ",", ".") and not s.endswith(("(", ".")):
            s += " "
        s += txt
    return s


# ---------------------------------------------------------------------------
# Builtin function surface
# (yt/yt/library/query/base/builtin_function_registry.cpp)
# ---------------------------------------------------------------------------

# Plain renames: QL name -> Spark SQL function of identical arity/arg-order.
# Same-name functions (lower, length, concat, coalesce, if, greatest, ...)
# pass through untouched.
_FN_RENAMES: dict[str, str] = {
    "is_null": "isnull",
    "if_null": "ifnull",
    "is_nan": "isnan",
    "farm_hash": "xxhash64",
    "bigb_hash": "xxhash64",
    "cardinality": "approx_count_distinct",
    "argmin": "min_by",
    "argmax": "max_by",
    "numeric_to_string": "string",
    "parse_int64": "bigint",
    "parse_double": "double",
    "format_timestamp": "date_format",
    "format_timestamp_localtime": "date_format",  # engine runs UTC
    "list_contains": "array_contains",
    "list_has_intersection": "arrays_overlap",
    "make_list": "array",
    "make_map": "map",
}

# Templated expansions where QL arg order/semantics differ from any single
# Spark builtin. Rewritten at translation time into pure-SQL expressions —
# still fully Catalyst-planned, no Python at execution.
# {0},{1},... are the QL call's arguments (already translated).
_HELPERS: dict[str, str] = {
    # string helpers: QL puts the needle first (registry "is_substr").
    "is_substr": "contains({1}, {0})",
    "is_prefix": "startswith({1}, {0})",
    # re2 family: pattern first (registry regex_*).
    "regex_partial_match": "({1} rlike {0})",
    "regex_full_match": "({1} rlike concat('^(?:', {0}, ')$'))",
    "regex_replace_all": "regexp_replace({1}, {0}, {2})",
    # replace-first: locate the first match, splice the rewritten match.
    "regex_replace_first": (
        "(case when regexp_instr({1}, {0}) = 0 then {1} else concat("
        "substr({1}, 1, regexp_instr({1}, {0}) - 1), "
        "regexp_replace(regexp_extract({1}, {0}, 0), {0}, {2}), "
        "substr({1}, regexp_instr({1}, {0}) + length(regexp_extract({1}, {0}, 0)))"
        ") end)"
    ),
    # RE2::Extract: first match rewritten through the template.
    "regex_extract": "regexp_replace(regexp_extract({1}, {0}, 0), {0}, {2})",
    # RE2::QuoteMeta equivalent.
    "regex_escape": r"regexp_replace({0}, '([.^$|()\\[\\]{{}}*+?\\\\])', r'\\$1')",
    "timestamp_floor_hour": "date_trunc('hour', {0})",
    "timestamp_floor_day": "date_trunc('day', {0})",
    "timestamp_floor_week": "date_trunc('week', {0})",
    "timestamp_floor_month": "date_trunc('month', {0})",
    "timestamp_floor_year": "date_trunc('year', {0})",
    "timestamp_floor_hour_localtime": "date_trunc('hour', {0})",
    "timestamp_floor_day_localtime": "date_trunc('day', {0})",
    "timestamp_floor_week_localtime": "date_trunc('week', {0})",
    "timestamp_floor_month_localtime": "date_trunc('month', {0})",
    "timestamp_floor_year_localtime": "date_trunc('year', {0})",
    # uint64 discipline: DECIMAL(20,0) carries the full unsigned range.
    "parse_uint64": "cast({0} as decimal(20,0))",
    # format_guid(id_hi, id_lo): lo-hi halves as 4 dash-separated lowercase
    # hex components without leading zeros (engine/udf/format_guid.c).
    "format_guid": (
        "concat_ws('-', "
        "lower(hex(shiftrightunsigned(cast({1} as bigint), 32))), "
        "lower(hex(cast({1} as bigint) & 4294967295)), "
        "lower(hex(shiftrightunsigned(cast({0} as bigint), 32))), "
        "lower(hex(cast({0} as bigint) & 4294967295)))"
    ),
    "is_finite": "(not isnan({0}) and abs({0}) <> double('Infinity'))",
    # YSON Any getters: Any columns are JSON strings here; a /a/b ypath
    # becomes a $.a.b JSON path (literal paths converted below, including
    # /list/0 indexes). get_* and try_get_* share semantics in this
    # engine: both yield NULL on a missing path (Spark expressions don't
    # raise per-row); the reference's get_* would error instead.
    "get_int64": "cast(get_json_object({0}, {path1}) as bigint)",
    "try_get_int64": "cast(get_json_object({0}, {path1}) as bigint)",
    "get_uint64": "cast(get_json_object({0}, {path1}) as decimal(20,0))",
    "try_get_uint64": "cast(get_json_object({0}, {path1}) as decimal(20,0))",
    "get_double": "cast(get_json_object({0}, {path1}) as double)",
    "try_get_double": "cast(get_json_object({0}, {path1}) as double)",
    "get_boolean": "cast(get_json_object({0}, {path1}) as boolean)",
    "try_get_boolean": "cast(get_json_object({0}, {path1}) as boolean)",
    "get_string": "get_json_object({0}, {path1})",
    "try_get_string": "get_json_object({0}, {path1})",
    "get_any": "get_json_object({0}, {path1})",
    "try_get_any": "get_json_object({0}, {path1})",
    "ypath_get": "get_json_object({0}, {path1})",
    # Any <-> string casts are identity on the JSON representation.
    "to_any": "({0})",
    "yson_string_to_any": "({0})",
    "any_to_yson_string": "({0})",
    "make_entity": "NULL",
    "yson_length": (
        "coalesce(json_array_length({0}), size(json_object_keys({0})))"
    ),
}

_REWRITE_GROUP_REF = re.compile(r"\\\\(\d)|\\(\d)")


def _re2_rewrite_to_java(literal: str) -> str:
    """Convert an RE2 rewrite template literal (``\\1``) to Java's ``$1``."""
    body = literal[1:-1]
    body = _REWRITE_GROUP_REF.sub(lambda m: "$" + (m.group(1) or m.group(2)), body)
    return literal[0] + body + literal[0]


def _ypath_to_json_path(arg: str) -> str:
    """``'/a/b/0'`` ypath literal → ``'$.a.b[0]'`` JSON path. Non-literal
    args fall back to a runtime string rewrite (no list-index support)."""
    s = arg.strip()
    if len(s) >= 2 and s[0] in "'\"" and s[-1] == s[0]:
        parts = [p for p in s[1:-1].split("/") if p]
        out = "$"
        for p in parts:
            out += f"[{p}]" if p.isdigit() else f".{p}"
        return f"'{out}'"
    return f"concat('$', replace({s}, '/', '.'))"


def _apply_helper(name: str, args: list[str]) -> str:
    template = _HELPERS[name]
    kwargs = {}
    if "{path1}" in template:
        if len(args) < 2:
            raise QLSyntaxError(f"{name} expects (any, path) arguments")
        kwargs["path1"] = _ypath_to_json_path(args[1])
    if name in ("regex_replace_all", "regex_replace_first", "regex_extract"):
        if len(args) != 3:
            raise QLSyntaxError(f"{name} expects 3 arguments")
        r = args[2].strip()
        if len(r) >= 2 and r[0] in "'\"" and r[-1] == r[0]:
            args = [args[0], args[1], _re2_rewrite_to_java(r)]
    try:
        return template.format(*args, **kwargs)
    except IndexError:
        raise QLSyntaxError(f"wrong argument count for {name}({', '.join(args)})")


# ---------------------------------------------------------------------------
# Structural passes (token level)
# ---------------------------------------------------------------------------


def _find_kw(tokens: list[Tok], *words: str, start: int = 0) -> int:
    """Index of the first depth-0 occurrence of a keyword, or -1."""
    depth = 0
    for i in range(start, len(tokens)):
        t = tokens[i]
        if t.kind == "PUNCT":
            depth += t.text == "("
            depth -= t.text == ")"
        elif depth == 0 and t.is_kw(*words):
            return i
    return -1


def _parse_call_args(tokens: list[Tok], open_idx: int) -> tuple[list[list[Tok]], int]:
    """Args of a call whose ``(`` is at open_idx → (arg token lists, index
    one past the ``)``). Comma splits only at depth 0 — string literals are
    single tokens, so quoted commas can never split an argument."""
    assert tokens[open_idx].text == "("
    depth, i, args, cur = 1, open_idx + 1, [], []
    while i < len(tokens):
        t = tokens[i]
        if t.kind == "PUNCT" and t.text == "(":
            depth += 1
        elif t.kind == "PUNCT" and t.text == ")":
            depth -= 1
            if depth == 0:
                if cur or args:
                    args.append(cur)
                return args, i + 1
        elif t.kind == "PUNCT" and t.text == "," and depth == 1:
            args.append(cur)
            cur = []
            i += 1
            continue
        cur.append(t)
        i += 1
    raise QLSyntaxError("unbalanced parentheses in QL query")


def _expand_functions(tokens: list[Tok]) -> list[Tok]:
    """Rename registry functions and expand templated helpers, innermost
    args first."""
    out: list[Tok] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        nxt = tokens[i + 1] if i + 1 < len(tokens) else None
        if (
            t.kind == "IDENT"
            and nxt is not None
            and nxt.kind == "PUNCT"
            and nxt.text == "("
        ):
            low = t.text.lower()
            if low in _HELPERS:
                raw_args, j = _parse_call_args(tokens, i + 1)
                args = [_render(_expand_functions(a)) for a in raw_args]
                out.append(Tok("RAW", _apply_helper(low, args)))
                i = j
                continue
            if low in _FN_RENAMES:
                out.append(Tok("IDENT", _FN_RENAMES[low]))
                i += 1
                continue
        out.append(t)
        i += 1
    return out


_CLAUSE_KWS = ("where", "group", "having", "order", "limit", "offset")
_JOIN_BOUNDARY = _CLAUSE_KWS + ("left", "join", "array")


def _rewrite_array_joins(tokens: list[Tok]) -> list[Tok]:
    """``[LEFT] ARRAY JOIN e1 AS a1, e2 AS a2`` → LATERAL VIEW.

    Single array: ``LATERAL VIEW [OUTER] explode(e1) __aj AS a1``.
    Multiple arrays flatten in parallel (zip, null-padded — the
    reference's TArrayJoin, ast.h:485-502): positional-explode the first
    array and substitute every later alias with
    ``element_at(eK, __aj_pos + 1)`` (NULL past the end, matching the
    reference's padding).
    """
    while True:
        aj = _find_kw(tokens, "array")
        if aj < 0 or not (aj + 1 < len(tokens) and tokens[aj + 1].is_kw("join")):
            return tokens
        is_left = aj > 0 and tokens[aj - 1].is_kw("left")
        start = aj - 1 if is_left else aj
        # collect "expr AS alias" pairs up to the next clause boundary
        i = aj + 2
        pairs: list[tuple[list[Tok], str]] = []
        cur: list[Tok] = []
        depth = 0
        alias: str | None = None
        end = len(tokens)
        while i < len(tokens):
            t = tokens[i]
            if t.kind == "PUNCT":
                depth += t.text == "("
                depth -= t.text == ")"
            if depth == 0 and t.is_kw(*_JOIN_BOUNDARY):
                end = i
                break
            if depth == 0 and t.is_kw("as"):
                if i + 1 >= len(tokens) or tokens[i + 1].kind != "IDENT":
                    raise QLSyntaxError("ARRAY JOIN: expected alias after AS")
                alias = tokens[i + 1].text
                i += 2
                continue
            if depth == 0 and t.kind == "PUNCT" and t.text == ",":
                if alias is None:
                    raise QLSyntaxError(
                        "ARRAY JOIN requires 'expr AS alias' form in the "
                        "string surface (bare column flattening would shadow "
                        "the source column)"
                    )
                pairs.append((cur, alias))
                cur, alias = [], None
                i += 1
                continue
            cur.append(t)
            i += 1
        if alias is None:
            raise QLSyntaxError("ARRAY JOIN requires 'expr AS alias' form")
        pairs.append((cur, alias))

        outer = "OUTER " if is_left else ""
        first_expr = _render(pairs[0][0])
        if len(pairs) == 1:
            clause = f"LATERAL VIEW {outer}explode({first_expr}) __aj AS {pairs[0][1]}"
            subst: dict[str, str] = {}
        else:
            clause = (
                f"LATERAL VIEW {outer}posexplode({first_expr}) __aj "
                f"AS __aj_pos, {pairs[0][1]}"
            )
            # try_element_at: NULL past the end (ANSI-safe null padding)
            subst = {
                al: f"try_element_at({_render(expr)}, __aj_pos + 1)"
                for expr, al in pairs[1:]
            }
        new = tokens[:start] + [Tok("RAW", clause)] + tokens[end:]
        if subst:
            replaced: list[Tok] = []
            for k, t in enumerate(new):
                if (
                    t.kind == "IDENT"
                    and t.text in subst
                    and not (k > 0 and new[k - 1].is_kw("as"))
                ):
                    t = Tok("RAW", subst[t.text])
                replaced.append(t)
            new = replaced
        tokens = new


def _rewrite_with_index(tokens: list[Tok], schema_fn) -> list[Tok]:
    """``FROM t WITH INDEX idx`` → ``FROM t JOIN idx USING (<shared cols>)``.

    The shared columns of a FullSync index projection are exactly the
    index's columns (indexed cols + primary key), so an inner equi-join on
    all of them reproduces the reference's index rewrite
    (TransformWithIndexStatement, secondary_index/transform.cpp) while
    letting Catalyst push indexed-column predicates into BOTH scans —
    the index table prunes IO the same way index tablets do.
    """
    wi = _find_kw(tokens, "with")
    while wi >= 0:
        if wi + 1 < len(tokens) and tokens[wi + 1].is_kw("index"):
            break
        wi = _find_kw(tokens, "with", start=wi + 1)
    else:
        return tokens
    if wi < 0:
        return tokens
    if wi + 2 >= len(tokens):
        raise QLSyntaxError("WITH INDEX: missing index table")
    base = tokens[wi - 1]
    idx = tokens[wi + 2]
    if schema_fn is None:
        raise QLSyntaxError(
            "WITH INDEX requires schema information; pass a catalog/session "
            "to select_rows"
        )
    base_cols = set(schema_fn(base.text))
    shared = [c for c in schema_fn(idx.text) if c in base_cols]
    if not shared:
        raise QLSyntaxError(
            f"WITH INDEX: index {idx.text} shares no columns with {base.text}"
        )
    joined = f"{base.text} JOIN {idx.text} USING ({', '.join(shared)})"
    return tokens[: wi - 1] + [Tok("RAW", joined)] + tokens[wi + 3 :]


def _rewrite_using(tokens: list[Tok]) -> list[Tok]:
    """QL ``JOIN t USING a, b`` (bare identifier list, parser.ypp:380) →
    SQL ``USING (a, b)``."""
    out: list[Tok] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t.is_kw("using") and i + 1 < len(tokens) and tokens[i + 1].kind == "IDENT":
            cols = [tokens[i + 1].text]
            j = i + 2
            while (
                j + 1 < len(tokens)
                and tokens[j].kind == "PUNCT"
                and tokens[j].text == ","
                and tokens[j + 1].kind == "IDENT"
                and not tokens[j + 1].is_kw(*_CLAUSE_KWS, "left", "join", "array", "on")
            ):
                cols.append(tokens[j + 1].text)
                j += 2
            out.append(Tok("RAW", f"USING ({', '.join(cols)})"))
            i = j
            continue
        out.append(t)
        i += 1
    return out


def _rewrite_totals(tokens: list[Tok]) -> list[Tok]:
    """``GROUP BY keys WITH TOTALS`` → ``GROUP BY ROLLUP(keys)`` — the
    rollup grand-total row is QL's TOTALS row (BeforeHaving mode)."""
    g = _find_kw(tokens, "group")
    if g < 0:
        return tokens
    # find WITH TOTALS at depth 0 after the group list
    wt = -1
    i = g + 1
    depth = 0
    while i < len(tokens) - 1:
        t = tokens[i]
        if t.kind == "PUNCT":
            depth += t.text == "("
            depth -= t.text == ")"
        if depth == 0 and t.is_kw("with") and tokens[i + 1].is_kw("totals"):
            wt = i
            break
        if depth == 0 and t.is_kw("having", "order", "limit", "offset"):
            break
        i += 1
    if wt < 0:
        return tokens
    if not tokens[g + 1].is_kw("by"):
        raise QLSyntaxError("GROUP must be followed by BY")
    keys = _render(tokens[g + 2 : wt])
    return tokens[:g] + [Tok("RAW", f"GROUP BY ROLLUP({keys})")] + tokens[wt + 2 :]


def _rewrite_offset_limit(tokens: list[Tok]) -> list[Tok]:
    """QL clause order ``OFFSET n LIMIT m`` (parser.ypp:488-503) → SQL
    ``LIMIT m OFFSET n``."""
    o = _find_kw(tokens, "offset")
    if o < 0:
        return tokens
    lim = _find_kw(tokens, "limit", start=o)
    if lim != o + 2:
        return tokens
    n, m = tokens[o + 1], tokens[lim + 1]
    return (
        tokens[:o]
        + [Tok("RAW", f"LIMIT {m.text} OFFSET {n.text}")]
        + tokens[lim + 2 :]
    )


def _substitute_placeholders(tokens: list[Tok], values: dict | None) -> list[Tok]:
    out = []
    for t in tokens:
        if t.kind != "PLACEHOLDER":
            out.append(t)
            continue
        name = t.text[1:-1]
        if values is None or name not in values:
            raise QLSyntaxError(f"no value supplied for placeholder {{{name}}}")
        out.append(Tok("RAW", _to_sql_literal(values[name])))
    return out


def _to_sql_literal(v) -> str:
    """Placeholder value → SQL literal. Scalars and flat lists only, the
    same restriction as the reference (query_preparer.cpp:529: "values
    should be plain types or lists")."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "(" + ", ".join(_to_sql_literal(x) for x in v) + ")"
    raise QLSyntaxError(f"unsupported placeholder value type: {type(v).__name__}")


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def translate_ql(
    query: str,
    table_resolver=None,
    placeholder_values: dict | None = None,
    schema_fn=None,
) -> str:
    """QL query string → Spark SQL string.

    ``table_resolver(path)`` maps a Cypress path to a view name (default:
    basename). ``schema_fn(view_name)`` returns column names — required
    only for ``WITH INDEX``. ``placeholder_values`` supplies ``{name}``
    literals.
    """
    tokens = _tokenize(query.strip())

    def resolve(path: str) -> str:
        if table_resolver:
            return table_resolver(path)
        return path.rsplit("/", 1)[-1]

    tokens = [
        Tok("IDENT", resolve(t.text.strip()[1:-1].strip())) if t.kind == "TABLE" else t
        for t in tokens
    ]
    tokens = _substitute_placeholders(tokens, placeholder_values)

    # ORDER BY requires LIMIT — the same error the reference raises
    # (query_preparer.cpp:1136: "ORDER BY used without LIMIT").
    if _find_kw(tokens, "order") >= 0 and _find_kw(tokens, "limit") < 0:
        raise QLSyntaxError("ORDER BY used without LIMIT in QL query")

    tokens = _rewrite_with_index(tokens, schema_fn)
    tokens = _rewrite_array_joins(tokens)
    tokens = _rewrite_using(tokens)
    tokens = _rewrite_totals(tokens)
    tokens = _rewrite_offset_limit(tokens)
    tokens = _expand_functions(tokens)

    sql = _render(tokens)
    if not re.match(r"^\s*select\b", sql, re.IGNORECASE):
        sql = "SELECT " + sql
    sql = _rewrite_transform_expr(sql)
    sql = _lower_tuple_in(sql)
    sql = _deordinal_group_by(sql)
    return sql


# --- QL TRANSFORM expression (ast.cpp:321 TTransformExpression,
# expr_builder_v1.cpp:1282): ``TRANSFORM(expr, (from...), (to...)
# [, default])`` — value remapping; tuple keys compare componentwise ----------


def _rewrite_transform_expr(sql: str) -> str:
    from ytsaurus_spark.yql.dialect import _split_call_args

    m = re.search(r"(?i)(?<![\w.])transform\s*\(", sql)
    if not m:
        return sql
    args, end = _split_call_args(sql, sql.index("(", m.end() - 1))
    if len(args) not in (3, 4):
        raise QLSyntaxError("TRANSFORM expects (expr, (from), (to)[, default])")
    expr, frm, to = (a.strip() for a in args[:3])
    default = args[3].strip() if len(args) == 4 else None

    def tuple_items(s: str) -> list[str]:
        s = s.strip()
        if not (s.startswith("(") and s.endswith(")")):
            raise QLSyntaxError("TRANSFORM from/to lists must be tuples")
        inner_args, _ = _split_call_args(s, s.index("("))
        return [a.strip() for a in inner_args if a.strip()]

    keys, vals = tuple_items(frm), tuple_items(to)
    if len(keys) != len(vals):
        raise QLSyntaxError("TRANSFORM from/to lists differ in length")
    lhs = [e.strip() for e in tuple_items(expr)] \
        if expr.startswith("(") and "," in expr else [expr]
    arms = []
    for k, v in zip(keys, vals):
        ks = [e.strip() for e in tuple_items(k)] if len(lhs) > 1 else [k]
        cond = " AND ".join(f"({c}) = ({x})" for c, x in zip(lhs, ks))
        arms.append(f"WHEN {cond} THEN {v}")
    else_part = f" ELSE {default}" if default is not None else ""
    rep = "CASE " + " ".join(arms) + else_part + " END"
    return sql[: m.start()] + rep + _rewrite_transform_expr(sql[end:])


def _lower_tuple_in(sql: str) -> str:
    """``(a, b) IN ((1, 'x'), ...)`` → OR-of-AND equalities. Spark's
    native struct-IN refuses mixed literal widths (bigint column vs int
    literal inside a struct never coerces); per-column equality gets the
    normal coercion rules AND lets Catalyst extract key ranges."""
    from ytsaurus_spark.yql.dialect import _split_call_args

    out, pos = sql, 0
    while True:
        m = re.compile(r"\)\s+(not\s+)?in\s*\(", re.IGNORECASE).search(
            out, pos)
        if not m:
            return out
        # find the lhs group ending at the ')' that starts the match
        depth, i = 0, m.start()
        while i >= 0:
            if out[i] == ")":
                depth += 1
            elif out[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        lhs_inner, _ = _split_call_args(out, i)
        # a call's arg list (f(a,b) IN ...) stays native — but a keyword
        # before the group (WHERE/AND/...) means an expression tuple
        prev = out[:i].rstrip()
        wm = re.search(r"([A-Za-z_]\w*)$", prev)
        is_call = bool(wm) and wm.group(1).lower() not in (
            "where", "and", "or", "not", "on", "when", "then", "else",
            "having", "select", "by",
        )
        if len(lhs_inner) < 2 or is_call:
            pos = m.end()
            continue
        rhs_open = out.index("(", m.end() - 1)
        rhs_items, rhs_end = _split_call_args(out, rhs_open)
        cols = [c.strip() for c in lhs_inner]
        ors = []
        for item in rhs_items:
            item = item.strip()
            if not (item.startswith("(") and item.endswith(")")):
                raise QLSyntaxError("tuple IN list items must be tuples")
            vals, _ = _split_call_args(item, item.index("("))
            if len(vals) != len(cols):
                raise QLSyntaxError("tuple IN arity mismatch")
            ors.append("(" + " AND ".join(
                f"({c}) = ({v.strip()})" for c, v in zip(cols, vals)) + ")")
        pred = "(" + " OR ".join(ors) + ")"
        if m.group(1):
            pred = f"(NOT {pred})"
        out = out[:i] + pred + out[rhs_end:]
        pos = i + len(pred)


def _deordinal_group_by(sql: str) -> str:
    """QL has no positional GROUP BY — ``GROUP BY 1`` groups by the
    CONSTANT 1 (one global group). Spark reads a bare integer literal
    as an ordinal; casting it keeps the constant semantics."""
    def fix(m: re.Match) -> str:
        items = [i.strip() for i in m.group(1).split(",")]
        fixed = [f"CAST({i} AS BIGINT)" if re.fullmatch(r"\d+", i) else i
                 for i in items]
        return "GROUP BY " + ", ".join(fixed) + m.group(2)

    return re.sub(
        r"(?is)\bGROUP BY\s+([^()]*?)(\s*(?:$|\bhaving\b|\border\b|"
        r"\blimit\b|\boffset\b|\bwith\b))",
        fix, sql)


class QueryRowLimitError(RuntimeError):
    """SelectRows row-limit breach (TSelectRowsOptions InputRowLimit /
    OutputRowLimit, client_common.h:166-168): the reference stops the
    query and reports an incomplete result; we surface it as an error —
    the strictest of its fail-on-incomplete behaviors."""


class FullScanError(RuntimeError):
    """SelectRows with allow_full_scan=False refused an unfiltered scan
    (the reference's default safety rail on dynamic tables)."""


def select_rows(
    spark: SparkSession,
    query: str,
    table_resolver=None,
    placeholder_values: dict | None = None,
    input_row_limit: int | None = None,
    output_row_limit: int | None = None,
    allow_full_scan: bool = True,
) -> DataFrame:
    """Run a QL query string. Tables must be registered as temp views (the
    catalog's register_all does this); ``[//any/path/name]`` resolves to the
    view ``name`` unless a custom resolver is given.

    Row-limit knobs mirror TSelectRowsOptions (client_common.h:166-168):
    ``input_row_limit`` bounds rows READ from the source tables,
    ``output_row_limit`` bounds result rows; a breach raises
    QueryRowLimitError. ``allow_full_scan=False`` refuses a query with no
    WHERE clause (the reference's dynamic-table default — here it
    defaults to True because static-table scans are the common case)."""
    seen_tables: list[str] = []

    def recording_resolver(path: str) -> str:
        name = table_resolver(path) if table_resolver else path.rsplit("/", 1)[-1]
        seen_tables.append(name)
        return name

    sql = translate_ql(
        query,
        recording_resolver,
        placeholder_values,
        schema_fn=lambda name: spark.table(name).columns,
    )
    if not allow_full_scan and " WHERE " not in f" {sql} ".upper():
        raise FullScanError(
            "query has no WHERE clause and allow_full_scan is False"
        )
    if input_row_limit is not None:
        scanned = sum(spark.table(t).count() for t in set(seen_tables))
        if scanned > input_row_limit:
            raise QueryRowLimitError(
                f"input row limit exceeded: {scanned} > {input_row_limit}"
            )
    out = spark.sql(sql)
    if output_row_limit is not None:
        n = out.limit(output_row_limit + 1).count()
        if n > output_row_limit:
            raise QueryRowLimitError(
                f"output row limit exceeded: > {output_row_limit}"
            )
    return out


def explain_select_rows(
    spark: SparkSession,
    query: str,
    table_resolver=None,
    placeholder_values: dict | None = None,
) -> dict:
    """ExplainQuery API parity (reference `explain_query`,
    yt/yt/client/api/client.h TExplainQueryOptions; driver command
    `explain_query` returns the parsed AST plus per-subquery optimized
    plans). Returns the same three views a reference user gets:

    - ``query``: the original QL text;
    - ``translated_sql``: what the QL front-end compiled to (the AST
      analog — our "parse" artifact is the Spark SQL rendering);
    - ``plan``: Catalyst's formatted physical plan — the optimized-plan
      analog, showing pushed filters, read schema, join strategies and
      exchanges (what the reference shows as per-tablet subquery plans).

    Nothing executes: the plan comes from the query's lazy analysis."""
    sql = translate_ql(
        query,
        table_resolver,
        placeholder_values,
        schema_fn=lambda name: spark.table(name).columns,
    )
    df = spark.sql(sql)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return {"query": query, "translated_sql": sql, "plan": plan}
