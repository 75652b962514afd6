"""MATCH_RECOGNIZE as YQL SQL text (reference grammar:
yql/essentials/sql/v1/sql_match_recognize.cpp — row_pattern_recognition_
clause attached to a FROM item).

The dialect cannot express MATCH_RECOGNIZE as a single Spark SQL string —
row-pattern matching is the one reference operator Catalyst has no
relational form for. Instead, ``expand_match_recognize`` finds each
``FROM <source> MATCH_RECOGNIZE (<spec>)`` item, runs the repo's
DataFrame operator (operators/match_recognize.py: one shuffle on
PARTITION BY, per-key ordered regex scan in an Arrow-batched pandas
pass), registers the result as a temp view, and splices the view name
back into the statement — the surrounding SELECT then goes through the
normal translation path.

Supported spec (the reference tests' shape,
yql/essentials/tests/sql/suites/match_recognize):

    PARTITION BY cols
    ORDER BY cols
    MEASURES First(V.ts) AS a, Last(ts) AS b, count(*) AS n, ...
    [ONE ROW PER MATCH]
    [AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] Sym]
    PATTERN (A B+ C*)
    DEFINE A AS <row predicate>, B AS <row predicate>, ...

Measure argument ``Sym.col`` scopes the aggregate to that symbol's rows
within the match; bare ``col`` aggregates over the whole match. DEFINE
predicates are per-row boolean SQL and may navigate with ``PREV(Sym.col
[, n])`` / ``NEXT(Sym.col [, n])`` (sql_match_recognize.cpp navigation
functions): per SQL:2016 row-pattern semantics these move over PHYSICAL
rows in the partition ordering (the symbol qualifier only scopes the
column), so they lower onto lag/lead columns materialized by
``operators.match_recognize.with_navigation`` — one window over the same
(partition, order) the match scan already shuffles on."""

from __future__ import annotations

import re

__all__ = ["expand_match_recognize", "parse_mr_spec"]

_MR_RE = re.compile(
    r"(?is)\bfrom\s+(`//[^`]+`|[A-Za-z_][\w.]*)\s+match_recognize\s*\("
)
_CLAUSE_RE = re.compile(
    r"(?is)\b(partition\s+by|order\s+by|measures|one\s+row\s+per\s+match|"
    r"all\s+rows\s+per\s+match|after\s+match|pattern|define)\b"
)
_MEASURE_RE = re.compile(
    r"(?is)^\s*(first|last|min|max|sum|count|avg)\s*\(\s*"
    r"(?:(\*)|(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*))\s*\)\s+"
    r"as\s+([A-Za-z_]\w*)\s*$"
)


_NAV_RE = re.compile(
    r"(?is)\b(prev|next)\s*\(\s*(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)"
    r"\s*(?:,\s*(-?\d+)\s*)?\)"
)


def rewrite_navigation(cond: str) -> tuple[str, dict[str, int]]:
    """Rewrite ``PREV(Sym.col [, n])`` / ``NEXT(...)`` inside a DEFINE
    predicate to the ``__prev_<col>[_n]`` / ``__next_<col>[_n]`` columns
    with_navigation materializes. Returns (rewritten condition,
    {column: max depth}). The offset must be a positive integer literal
    (the reference grammar takes an unsigned literal; 0/negative would
    navigate nowhere or backwards through the other function)."""
    needs: dict[str, int] = {}

    def sub(m: re.Match) -> str:
        kind, col = m.group(1).lower(), m.group(3)
        k = int(m.group(4)) if m.group(4) is not None else 1
        if k <= 0:
            raise ValueError(
                f"{m.group(1).upper()} offset must be a positive integer, "
                f"got {k}"
            )
        needs[col] = max(needs.get(col, 0), k)
        suffix = f"_{k}" if k > 1 else ""
        return f"__{kind}_{col}{suffix}"

    return _NAV_RE.sub(sub, cond), needs


def _split_top(s: str, sep: str = ",") -> list[str]:
    out, depth, buf = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf).strip())
    return [x for x in out if x]


def parse_mr_spec(spec: str) -> dict:
    """Split the MATCH_RECOGNIZE body into its clauses."""
    bounds = [(m.start(), m.end(), re.sub(r"\s+", " ", m.group(1).lower()))
              for m in _CLAUSE_RE.finditer(spec)]
    if not bounds:
        raise ValueError("empty MATCH_RECOGNIZE specification")
    parts: dict[str, str] = {}
    for i, (_s, e, kw) in enumerate(bounds):
        nxt = bounds[i + 1][0] if i + 1 < len(bounds) else len(spec)
        parts[kw] = spec[e:nxt].strip()

    out: dict = {
        "partition_by": _split_top(parts.get("partition by", "")),
        "order_by": _split_top(parts.get("order by", "")),
        "all_rows": "all rows per match" in parts,
    }

    measures = []
    for item in _split_top(parts.get("measures", "")):
        m = _MEASURE_RE.match(item)
        if not m:
            raise ValueError(f"unsupported MEASURES item {item!r}")
        kind, star, sym, col, name = (
            m.group(1).lower(), m.group(2), m.group(3), m.group(4),
            m.group(5),
        )
        if star:
            if kind != "count":
                raise ValueError(f"{kind}(*) is not a measure")
            col = None
        measures.append((name, kind, col, sym))
    out["measures"] = measures

    skip = parts.get("after match", "")
    skip = re.sub(r"(?is)^\s*skip\s+", "", skip).strip()
    if not skip or skip.lower() == "past last row":
        out["skip"] = "past_last_row"
    elif skip.lower() == "to next row":
        out["skip"] = "to_next_row"
    else:
        # keywords fold case; the SYMBOL name stays case-sensitive
        m = re.match(r"(?is)^to\s+(first|last)\s+([A-Za-z_]\w*)$", skip)
        if not m:
            raise ValueError(f"unsupported AFTER MATCH SKIP {skip!r}")
        out["skip"] = (f"to_{m.group(1).lower()}", m.group(2))

    pat = parts.get("pattern", "")
    if not (pat.startswith("(") and pat.endswith(")")):
        raise ValueError("PATTERN must be parenthesized")
    out["pattern"] = pat[1:-1].strip()

    defines = []
    for item in _split_top(parts.get("define", "")):
        m = re.match(r"(?is)^([A-Za-z_]\w*)\s+as\s+(.*)$", item.strip())
        if not m:
            raise ValueError(f"unsupported DEFINE item {item!r}")
        defines.append((m.group(1), m.group(2).strip()))
    if not defines:
        raise ValueError("MATCH_RECOGNIZE needs a DEFINE clause")
    out["defines"] = defines
    return out


def _measure_ddl(df, name: str, kind: str, col: str | None) -> str:
    if kind == "count":
        return f"{name} bigint"
    if kind == "avg":
        return f"{name} double"
    src = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    if col not in src:
        raise ValueError(f"measure column {col!r} not in the source")
    if kind == "sum":
        t = src[col]
        return f"{name} {'bigint' if t in ('tinyint', 'smallint', 'int', 'bigint') else 'double'}"
    return f"{name} {src[col]}"


def expand_match_recognize(s2, text: str, resolve=None) -> str:
    """Replace every ``FROM <src> MATCH_RECOGNIZE (...)`` item in ``text``
    with a registered temp view of the operator's result. ``resolve``
    maps a backticked cypress path to a view name (defaults to
    basename)."""
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.match_recognize import (
        match_recognize_measures,
        match_recognize_rows,
    )

    resolve = resolve or (lambda p: p.rstrip("/").rsplit("/", 1)[-1])
    n = 0
    while True:
        m = _MR_RE.search(text)
        if not m:
            return text
        open_idx = text.index("(", m.end() - 1)
        # balanced-paren scan for the spec body
        depth, i = 0, open_idx
        while i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if depth != 0:
            raise ValueError("unbalanced MATCH_RECOGNIZE parens")
        spec = parse_mr_spec(text[open_idx + 1:i])
        end = i + 1
        am = re.match(r"(?is)\s+as\s+([A-Za-z_]\w*)", text[end:])
        alias = ""
        if am:
            alias = " " + am.group(1)
            end += am.end()

        src_ref = m.group(1)
        if src_ref.startswith("`"):
            src_ref = resolve(src_ref.strip("`"))
        df = s2.table(src_ref)
        base_cols = df.columns

        # PREV/NEXT navigation in DEFINE -> lag/lead columns
        nav_needs: dict[str, int] = {}
        defines = []
        for s, cond in spec["defines"]:
            cond, needs = rewrite_navigation(cond)
            for c, k in needs.items():
                nav_needs[c] = max(nav_needs.get(c, 0), k)
            defines.append((s, cond))
        spec["defines"] = defines
        if nav_needs:
            from ytsaurus_spark.operators.match_recognize import (
                with_navigation,
            )

            missing = [c for c in nav_needs if c not in base_cols]
            if missing:
                raise ValueError(
                    f"PREV/NEXT references unknown columns {missing}"
                )
            df = with_navigation(
                df, spec["partition_by"], spec["order_by"],
                sorted(nav_needs), depth=max(nav_needs.values()),
            )

        # single-char symbol mapping for the regex engine
        sym_names = [s for s, _ in spec["defines"]]
        charmap = {}
        for j, s in enumerate(sym_names):
            charmap[s] = s if len(s) == 1 else chr(ord("A") + j)
        if len(set(charmap.values())) != len(charmap):
            charmap = {
                s: chr(ord("A") + j) for j, s in enumerate(sym_names)
            }
        symbols = [
            (charmap[s], F.expr(cond)) for s, cond in spec["defines"]
        ]
        pattern = spec["pattern"]
        for s in sorted(sym_names, key=len, reverse=True):
            pattern = re.sub(rf"\b{re.escape(s)}\b", charmap[s], pattern)
        pattern = pattern.replace(" ", "")
        skip = spec["skip"]
        if isinstance(skip, tuple):
            if skip[1] not in charmap:
                raise ValueError(f"AFTER MATCH SKIP names unknown symbol "
                                 f"{skip[1]!r}")
            skip = (skip[0], charmap[skip[1]])

        if spec["all_rows"]:
            types = dict(df.dtypes)
            # navigation helper columns stay internal — ALL ROWS output
            # carries the SOURCE columns only
            keep = [c for c in base_cols if c not in spec["partition_by"]]
            ddl = ", ".join(
                [f"{c} {types[c]}" for c in spec["partition_by"]]
                + [f"{c} {types[c]}" for c in keep]
                + ["match_no bigint", "classifier string",
                   "row_in_match bigint"]
            )
            out = match_recognize_rows(
                df, spec["partition_by"], spec["order_by"], symbols,
                pattern, keep, ddl, after_match_skip=skip,
            )
        else:
            measures = {
                name: (kind, col,
                       charmap.get(sym) if sym is not None else None)
                for name, kind, col, sym in spec["measures"]
            }
            ddl = ", ".join(
                [f"{c} {t}" for c, t in df.select(*spec["partition_by"]).dtypes]
                + ["match_no bigint", "classifier string"]
                + [
                    _measure_ddl(df, name, kind, col)
                    for name, kind, col, _sym in spec["measures"]
                ]
            )
            out = match_recognize_measures(
                df, spec["partition_by"], spec["order_by"], symbols,
                pattern, measures, ddl, after_match_skip=skip,
            )
        view = f"__yql_mr{n}"
        n += 1
        out.createOrReplaceTempView(view)
        text = text[: m.start()] + f"from {view}{alias}" + text[end:]
