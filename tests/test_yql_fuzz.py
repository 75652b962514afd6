"""Randomized differential testing of the DIALECT machinery (YQL and
CHYT) — the translator-level analog of test_randomized.py: seeded random
scripts exercising value bindings, DECLARE parameters, expression
lambdas, portable Module::Function calls, 0-based SUBSTRING,
named-subquery refs, PRAGMA prefixes, regex-special substitution
payloads, and the ClickHouse surface (PREWHERE placements incl. inside
subqueries, GLOBAL JOIN/IN, *If combinators, multiIf, intDiv, two-arg
CAST, bare USING); the translated SQL runs on BOTH engines and must
match exactly. What this fuzzes is the TRANSLATION (binding resolution,
macro expansion, precedence safety, clause folding), not the engines —
any disagreement is a dialect bug. Deterministic (seed=7 for YQL,
seed=11 for CHYT), so failures reproduce. ≥220 scripts per full run."""

from __future__ import annotations

import random
import re as _re

import duckdb
import pytest

N_QUERIES = 120
N_CHYT_QUERIES = 100
ROWS = 150


@pytest.fixture(scope="module")
def harness(spark):
    rng = random.Random(7)
    rows = []
    for i in range(ROWS):
        k = rng.randint(0, 20)
        v = rng.choice([None, rng.randint(-100, 100)])
        s = rng.choice([None, "alpha", "Beta", "gamma x", "xx", "a'b"])
        rows.append((k, v, s))
    s2 = spark.newSession()
    s2.conf.set("spark.sql.ansi.enabled", "false")  # YQL total arithmetic
    df = s2.createDataFrame(rows, "k int, v int, s string")
    df.createOrReplaceTempView("ft")
    con = duckdb.connect()
    con.execute("CREATE TABLE ft (k INTEGER, v INTEGER, s VARCHAR)")
    con.executemany("INSERT INTO ft VALUES (?, ?, ?)", rows)
    return s2, con


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(x) if x is not None else None for x in r))
    return sorted(out, key=repr)


def _scripts(rng: random.Random):
    t = rng.randint(2, 15)
    m = rng.randint(1, 4)
    lit = rng.choice(["alpha", "x", "a"])
    yield from [
        # value bindings in predicates and LIMIT
        f"$t = {t}; $lim = {rng.randint(3, 30)};"
        f"select k, CAST(count(*) AS BIGINT) as n from ft"
        f" where k > $t group by k order by k limit $lim;",
        # lambda with value capture, called twice
        f"$base = {m};"
        "$f = ($x) -> ($x * 2 + $base);"
        "select k, $f(k) as fk, $f(coalesce(v, 0)) as fv from ft"
        f" where $f(k) > {t} order by k, fv;",
        # brace-form lambda + module function in body
        "$clean = ($x) -> { RETURN String::ReplaceAll("
        "String::ToLower(coalesce($x, '')), 'a', '_'); };"
        "select s, $clean(s) as c, CAST(count(*) AS BIGINT) as n"
        " from ft group by s order by s;",
        # portable module functions + YQL 0-based substring
        f"select k, String::Contains(coalesce(s, ''), '{lit}') as has,"
        f" substring(coalesce(s, ''), 0, {m}) as pre,"
        " left(coalesce(s, ''), 2) as l2"
        " from ft order by k, s;",
        # named subquery + IN $ref + value binding
        f"$hot = (select k from ft group by k"
        f" having CAST(count(*) AS BIGINT) >= {rng.randint(2, 6)});"
        f"$cut = {t};"
        "select k, CAST(sum(coalesce(v, 0)) AS BIGINT) as sv from ft"
        " where k in $hot and k <= $cut group by k order by k;",
        # DECLARE with default + param-free execution
        f"DECLARE $mod AS Int32 = {m + 1};"
        "select k % $mod as g, CAST(count(*) AS BIGINT) as n"
        " from ft group by k % $mod order by g;",
        # lambda calling lambda, precedence-critical inlining
        "$inc = ($x) -> ($x + 1);"
        "$twice = ($x) -> ($inc($x) * 2);"
        f"select k, $twice(k) as w from ft where $twice(k) > {t * 2}"
        " order by k;",
        # PRAGMA prefix lines must be recorded, not leak into the SQL
        f"PRAGMA AnsiInForEmptyOrNullableItemsCollections;"
        f"PRAGMA yt.Pool = 'fuzz';"
        f"select k, CAST(count(*) AS BIGINT) as n from ft"
        f" where k between {m} and {t + m} group by k order by k;",
        # regex-special replacement payloads through lambda inlining
        # ($-group syntax must survive substitution verbatim; backslash
        # payloads are covered by test_lambda_backslash_payload — the
        # engines themselves disagree on '' literal escaping, so a
        # backslash here would fuzz the ENGINES, not the translator)
        "$mark = ($x) -> (String::ReplaceAll(coalesce($x, ''), 'a', "
        "'[$1&]'));"
        "select s, $mark(s) as m2 from ft order by s, m2;",
        # tuple IN + DISTINCT
        f"select distinct k from ft where (k, coalesce(v, -1)) in"
        f" ((1, -1), ({t}, -1), (2, 2)) or k = {m} order by k;",
        # window function with explicit NULLS ordering (engine defaults
        # differ: Spark nulls-first ASC, DuckDB nulls-last ASC)
        "select k, v, CAST(row_number() over (partition by k"
        " order by v asc nulls first, s asc nulls first) AS BIGINT) as rn"
        f" from ft where k <= {t} order by k, rn;",
        # LIKE + math module + CASE
        f"select k, CASE WHEN coalesce(s, '') like '%{lit}%' THEN 1"
        " ELSE 0 END as hit,"
        " Math::Abs(coalesce(v, 0)) as av"
        " from ft order by k, hit, av;",
        # PROCESS with OptionalIf filter lowers to WHERE + projection —
        # the output SQL is plain dual-engine text
        "$p = ($row) -> (OptionalIf($row.k > " + str(m) + ","
        " AsStruct($row.k AS k, coalesce($row.v, 0) * 2 AS v2)));"
        "PROCESS ft USING $p(TableRow());",
        # REDUCE with an aggregate AsStruct body lowers to GROUP BY
        "$r = ($row) -> (AsStruct(CAST(count(*) AS BIGINT) AS n,"
        " min($row.v) AS lo, max($row.v) AS hi));"
        "REDUCE ft ON k USING $r(TableRow());",
        # COMPACT hints drop out; SOME() -> any_value (deterministic
        # via a predicate over it)
        f"select k, CAST(count(*) AS BIGINT) as n,"
        " some(coalesce(v, 0)) >= -100 as has"
        f" from ft where k in compact ({m}, {t}, 1)"
        " group compact by k order by k;",
        # DEFINE SUBQUERY instantiated twice with different args —
        # hygienic internal bindings, lowered to two distinct CTEs
        "DEFINE SUBQUERY $big($src, $cut) AS"
        " $th = $cut;"
        " select k, coalesce(v, 0) as v0 from $src where k > $th;"
        "END DEFINE;"
        f"select (select CAST(count(*) AS BIGINT) from $big(ft, {m})) -"
        f" (select CAST(count(*) AS BIGINT) from $big(ft, {t}))"
        " as delta;",
        # DEFINE SUBQUERY in FROM with a GROUP BY over the template
        "DEFINE SUBQUERY $grp($src) AS"
        " select k, CAST(sum(coalesce(v, 0)) AS BIGINT) as sv"
        " from $src group by k;"
        "END DEFINE;"
        f"select k, sv from $grp(ft) where sv > {-t} order by k;",
        # portable core builtins: ?? (coalesce), MIN_OF/MAX_OF
        # (least/greatest), FIND (0-based instr), YQL cast-type names
        f"select k, v ?? {-m} as v0, MIN_OF(k, v ?? {t}) as mn,"
        f" MAX_OF(k, {m}) as mx, FIND(s ?? '', '{lit}') as f,"
        " CAST(k AS Int64) as k64, CAST(k AS Uint16) as ku"
        " from ft order by k, v0, f;",
        # ?? chains and ?? inside expressions
        f"select k, (v ?? k ?? 0) + {m} as c,"
        " coalesce(v, 0) - (v ?? 0) as z from ft order by k, c;",
        # integer-literal suffixes (123u/123ul/123l/0x hex) and string
        # suffixes ('…'u) drop to portable bare literals
        f"select k, k + {t}u as ku, k * {m}ul as kul, 0x10 + k as hx,"
        f" 'tag'u as tag, {t}l - k as kl from ft"
        f" where k <= 0xFF order by k;",
    ]


def test_yql_dialect_differential(harness):
    from ytsaurus_spark.yql.dialect import translate_yql

    s2, con = harness
    rng = random.Random(7)
    n, divergences = 0, []
    while n < N_QUERIES:
        for script in _scripts(rng):
            sql = translate_yql(script).sql
            got = _norm([tuple(r) for r in s2.sql(sql).collect()])
            want = _norm(con.execute(sql).fetchall())
            if got != want:
                divergences.append((script, got[:3], want[:3]))
            n += 1
    assert not divergences, divergences[:2]


def test_lambda_backslash_payload():
    """Lambda inlining must carry backslash payloads verbatim (the r7
    ADVICE defect class: str-template re.sub replacement corrupted
    '\\g<1>'). Translation-layer check — the two engines disagree on
    single-quoted-literal escaping, so this is not differential."""
    from ytsaurus_spark.yql.dialect import translate_yql

    script = (
        "$f = ($x) -> (String::ReplaceAll($x, 'a', '" + "\\\\g<1>" + "'));"
        "select $f(s) as m from ft;"
    )
    sql = translate_yql(script).sql
    assert "\\\\g<1>" in sql


def _chyt_scripts(rng: random.Random):
    a = rng.randint(0, 12)
    b = rng.randint(-50, 50)
    lit = rng.choice(["alpha", "Beta", "xx"])
    yield from [
        # *If combinators (sumIf coalesces to 0; min/max get the typed
        # default via the numeric fallback — args here are numeric)
        f'select k, sumIf(v, v > {b}) as s, countIf(s = \'{lit}\') as c1,'
        f' minIf(v, k > {a}) as mn, maxIf(coalesce(v, 0), k % 2 = 0) as mx'
        f' from "//home/f/ft" group by k order by k;',
        # PREWHERE ... WHERE with OR: must fold as (p) AND (a OR b)
        f'select k, v from "//home/f/ft" prewhere k > {a}'
        f' where v < {b} or v is null order by k, v, s;',
        # PREWHERE inside a subquery + outer WHERE (depth guard)
        f'select k, v from (select * from "//home/f/ft" prewhere'
        f' k <= {a + 8}) sub where coalesce(v, 0) >= {b} order by k, v, s;',
        # GLOBAL JOIN on an aliased subquery -> broadcast hint
        f'select t1.k as k, d.mv as mv from "//home/f/ft" t1 global join'
        f' (select k as kk, max(coalesce(v, 0)) as mv from "//home/f/ft"'
        f' group by k) d on t1.k = d.kk where t1.k <= {a}'
        " order by k, mv;",
        # GLOBAL IN + CH cast spelling
        f'select k from "//home/f/ft" where k global in'
        f' (select toInt64(k) + {a % 3} from "//home/f/ft" where'
        f' coalesce(v, 0) > {b}) order by k;',
        # multiIf / if / ifNull / nullIf
        f"select k, multiIf(coalesce(v, 0) > {abs(b)}, 'hi', coalesce(v,"
        f" 0) < {-abs(b)}, 'lo', 'mid') as band,"
        f" if(k % 2 = 0, 'even', 'odd') as par,"
        f" ifNull(v, {a}) as vn, nullIf(k, {a}) as kn"
        f' from "//home/f/ft" order by k, band, vn, kn;',
        # arithmetic spellings incl. truncating intDiv on negatives
        f"select k, CAST(intDiv(coalesce(v, {b or 1}), 3) AS BIGINT) as d,"
        f" CAST(modulo(k + {a}, 5) AS BIGINT) as m,"
        " CAST(negate(plus(k, multiply(2, k))) AS BIGINT) as np"
        f' from "//home/f/ft" order by k, d, np;',
        # two-arg CAST + CH type names in AS-form
        f"select CAST(k, 'Int64') as k64, CAST(k as Float64) as kf,"
        f" toString(k) as ks from \"//home/f/ft\" where k >= {a % 6}"
        " order by k64;",
        # bare USING list + uniqExact
        f'select t1.k as k, uniqExact(t2.s) as u from "//home/f/ft" t1'
        f' join (select k, s from "//home/f/ft" where k <= {a + 4}) t2'
        " using k group by t1.k order by k;",
        # LIMIT n BY group (top-n per group via a window)
        f'select k, v, s from "//home/f/ft" where v is not null'
        f" order by v desc, s nulls first, k"
        f" limit {1 + a % 3} by k limit {10 + a};",
        # GROUP BY ... WITH TOTALS -> GROUPING SETS ((k), ())
        f'select k, CAST(count(*) AS BIGINT) as n,'
        f" CAST(sum(coalesce(v, 0)) AS BIGINT) as sv"
        f' from "//home/f/ft" where k <= {a + 6}'
        " group by k with totals order by k nulls last, n;",
    ]


def test_chyt_dialect_differential(harness):
    """CHYT-shim differential fuzz: the round-7/8 ADVICE defects were all
    dialect-layer (clause folding, combinator defaults, hint targeting) —
    this drives those paths with seeded random placements on both
    engines. The only engine-spelling bridge is Spark's DIV -> DuckDB's
    // (the same substitution chyt_q.py's oracles use)."""
    from ytsaurus_spark.chyt import (
        resolve_if_defaults, resolve_length, translate_chyt,
    )

    s2, con = harness
    rng = random.Random(11)
    n, divergences = 0, []
    while n < N_CHYT_QUERIES:
        for script in _chyt_scripts(rng):
            sql = resolve_length(resolve_if_defaults(translate_chyt(script)))
            # engine-spelling bridges: Spark DIV = DuckDB //, Spark's
            # star-EXCEPT = DuckDB's star-EXCLUDE
            duck_sql = _re.sub(r"\bDIV\b", "//", sql)
            duck_sql = duck_sql.replace("* EXCEPT (", "* EXCLUDE (")
            try:
                got = _norm([tuple(r) for r in s2.sql(sql).collect()])
                want = _norm(con.execute(duck_sql).fetchall())
            except Exception as e:
                divergences.append((script, "ENGINE ERR",
                                    f"{type(e).__name__}: {e}"[:200]))
                n += 1
                continue
            if got != want:
                divergences.append((script, got[:3], want[:3]))
            n += 1
    assert not divergences, divergences[:2]


def _flatten_cases(rng: random.Random):
    """(yql_script, duckdb_oracle) pairs: FLATTEN BY lowers to LATERAL
    VIEW (Spark-only), so the differential pairs each script with a
    hand-built unnest oracle instead of running identical SQL."""
    t = rng.randint(0, 10)
    n = rng.randint(1, 3)
    yield (
        "select k, w from (select k, String::SplitToList("
        "coalesce(s, ''), ' ') as ws from ft) flatten by ws as w"
        f" where k > {t} order by k, w;",
        "select k, w from (select k, unnest(string_split("
        "coalesce(s, ''), ' ')) as w from ft)"
        f" where k > {t} order by k, w",
    )
    # replace form: the flattened column keeps its own name
    yield (
        "select ws, CAST(count(*) AS BIGINT) as c from (select k,"
        " String::SplitToList(coalesce(s, ''), ' ') as ws from ft)"
        f" flatten by ws where length(ws) >= {n}"
        " group by ws order by ws;",
        "select ws, CAST(count(*) AS BIGINT) as c from (select"
        " unnest(string_split(coalesce(s, ''), ' ')) as ws from ft)"
        f" where length(ws) >= {n} group by ws order by ws",
    )
    # OPTIONAL: unwrap nullable, dropping NULLs
    yield (
        "select k, vv from (select k, v from ft) flatten optional by"
        f" v as vv where vv <= {t} order by k, vv;",
        f"select k, v as vv from ft where v is not null and v <= {t}"
        " order by k, vv",
    )


def test_flatten_by_differential(harness):
    from ytsaurus_spark.yql.dialect import translate_yql

    s2, con = harness
    rng = random.Random(11)
    divergences = []
    for _ in range(10):
        for script, oracle in _flatten_cases(rng):
            got = _norm(
                [tuple(r) for r in s2.sql(translate_yql(script).sql)
                 .collect()]
            )
            want = _norm(con.execute(oracle).fetchall())
            if got != want:
                divergences.append((script, got[:3], want[:3]))
    assert not divergences, divergences[:2]
