"""Randomized differential testing of the YQL DIALECT machinery — the
translator-level analog of test_randomized.py: seeded random YQL scripts
exercising value bindings, DECLARE parameters, expression lambdas,
portable Module::Function calls, 0-based SUBSTRING, and named-subquery
refs; the translated SQL runs on BOTH engines and must match exactly.
What this fuzzes is the TRANSLATION (binding resolution, macro
expansion, precedence safety), not the engines — any disagreement is a
dialect bug. Deterministic (seed=7), so failures reproduce."""

from __future__ import annotations

import random

import duckdb
import pytest

N_QUERIES = 60
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
