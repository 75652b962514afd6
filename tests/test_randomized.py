"""Randomized differential testing — the Spark analog of the reference's
yt/systest (random composable operations validated against a model:
runner.cpp:28-60, validator.h:22). Seeded generator produces random tables
and random queries from the SQL subset both engines share; results must
match DuckDB exactly. Deterministic (seed=42), so failures reproduce.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

N_TABLES = 3
N_QUERIES = 130
ROWS_PER_TABLE = 120


def _gen_tables(rng: random.Random):
    tables = {}
    for i in range(N_TABLES):
        rows = []
        for j in range(ROWS_PER_TABLE):
            k = rng.randint(0, 20)
            v = rng.choice([None, rng.randint(-100, 100)])
            s = rng.choice([None, "x", "y", "z", "xx"])
            rows.append((k, v, s))
        tables[f"rt{i}"] = rows
    return tables


def _pred(rng: random.Random) -> str:
    opts = [
        f"k > {rng.randint(0, 15)}",
        f"k % {rng.randint(2, 5)} = 0",
        f"v IS NOT NULL AND v > {rng.randint(-50, 50)}",
        "v IS NULL",
        f"s = '{rng.choice(['x', 'y', 'z'])}'",
        "s IS NOT NULL",
    ]
    a, b = rng.sample(opts, 2)
    return f"({a}) {rng.choice(['AND', 'OR'])} ({b})"


def _gen_query(rng: random.Random) -> str:
    t = f"rt{rng.randrange(N_TABLES)}"
    kind = rng.randrange(14)
    if kind == 13:  # rank-within-parent over ROLLUP output (TPC-DS q70/q86
        # family): subtotal rows rank against subtotal rows only; all sort
        # keys coalesced so engine NULL-ordering defaults never diverge.
        # (no WHERE: the empty-input ROLLUP divergence is documented)
        return (
            f"WITH agg AS ("
            f"  SELECT k, s, CAST(count(*) AS BIGINT) AS n, "
            f"         CAST(sum(coalesce(v, 0)) AS BIGINT) AS sv, "
            f"         CAST(grouping(k) + grouping(s) AS BIGINT) AS lochier "
            f"  FROM {t} GROUP BY ROLLUP(k, s)), "
            f"ranked AS ("
            f"  SELECT k, s, n, sv, lochier, "
            f"    CAST(row_number() OVER ("
            f"      PARTITION BY lochier, CASE WHEN lochier = 0 THEN k END "
            f"      ORDER BY sv DESC, n DESC, coalesce(k, -1), coalesce(s, '')"
            f"    ) AS BIGINT) AS rn "
            f"  FROM agg) "
            f"SELECT * FROM ranked WHERE rn <= {rng.randint(2, 6)}"
        )
    if kind == 10:  # scalar correlated subquery in SELECT
        t2 = f"rt{rng.randrange(N_TABLES)}"
        return (
            f"SELECT k, v, "
            f"(SELECT max(b.v) FROM {t2} b WHERE b.k = a.k) AS mv, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM {t2} b WHERE b.k = a.k "
            f"AND b.v IS NOT NULL) AS nc "
            f"FROM {t} a WHERE {_pred(rng)} "
            f"ORDER BY k, v NULLS FIRST LIMIT 40"
        )
    if kind == 11:  # FILTER-clause aggregates
        return (
            f"SELECT k, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(count(*) FILTER (WHERE v IS NOT NULL AND v > {rng.randint(-50, 50)}) AS BIGINT) AS nf, "
            f"CAST(sum(coalesce(v, 0)) FILTER (WHERE s IS NOT NULL) AS BIGINT) AS sf, "
            f"min(v) FILTER (WHERE s = '{rng.choice(['x', 'y', 'z'])}') AS mf "
            f"FROM {t} WHERE {_pred(rng)} GROUP BY k"
        )
    if kind == 12:  # GROUPING SETS without the global set (empty-input safe)
        return (
            f"SELECT k, s, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(grouping(k) AS BIGINT) AS gk, CAST(grouping(s) AS BIGINT) AS gs, "
            f"CAST(sum(coalesce(v, 0)) AS BIGINT) AS sv "
            f"FROM {t} WHERE {_pred(rng)} GROUP BY GROUPING SETS ((k), (s), (k, s))"
        )
    if kind == 9:  # FULL OUTER join with coalesced keys
        t2 = f"rt{rng.randrange(N_TABLES)}"
        return (
            f"SELECT coalesce(a.k, b.k) AS k, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(coalesce(a.v, 0)) AS BIGINT) AS sa, "
            f"CAST(sum(coalesce(b.v, 0)) AS BIGINT) AS sb "
            f"FROM (SELECT k, v FROM {t} WHERE {_pred(rng)}) a "
            f"FULL JOIN (SELECT k, v FROM {t2} WHERE {_pred(rng)}) b "
            f"ON a.k = b.k GROUP BY coalesce(a.k, b.k)"
        )
    if kind == 7:  # correlated EXISTS / IN-subquery semi and anti joins
        t2 = f"rt{rng.randrange(N_TABLES)}"
        form = rng.randrange(3)
        if form == 0:
            return (
                f"SELECT k, CAST(count(*) AS BIGINT) AS n FROM {t} a "
                f"WHERE EXISTS (SELECT 1 FROM {t2} b WHERE b.k = a.k "
                f"AND b.v IS NOT NULL AND b.v > {rng.randint(-50, 50)}) "
                f"GROUP BY k"
            )
        if form == 1:
            return (
                f"SELECT k, v FROM {t} WHERE k IN "
                f"(SELECT k FROM {t2} WHERE {_pred(rng)}) "
                f"ORDER BY k, v NULLS FIRST LIMIT 40"
            )
        return (
            f"SELECT k, CAST(count(*) AS BIGINT) AS n FROM {t} "
            f"WHERE k NOT IN (SELECT coalesce(v, 0) FROM {t2} "
            f"WHERE v IS NOT NULL) GROUP BY k"
        )
    if kind == 8:  # string expression pipeline
        return (
            f"SELECT k, s, upper(coalesce(s, '')) AS up, "
            f"substr(coalesce(s, 'none'), 1, {rng.randint(1, 3)}) AS pre, "
            f"replace(coalesce(s, ''), 'x', '{rng.choice(['q', 'zz', ''])}') AS rep, "
            f"length(coalesce(s, '')) + k AS ln, "
            f"concat(coalesce(s, '_'), '-', CAST(k AS STRING)) AS joined "
            f"FROM {t} WHERE {_pred(rng)}"
        )
    if kind == 0:  # filter + project with expressions
        return (
            f"SELECT k, v, CASE WHEN k > 10 THEN 'hi' ELSE 'lo' END AS band, "
            f"k * 3 + coalesce(v, 0) AS expr1, abs(coalesce(v, -1)) AS expr2 "
            f"FROM {t} WHERE {_pred(rng)}"
        )
    if kind == 1:  # group + aggregates + having
        return (
            f"SELECT k, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(coalesce(v, 0)) AS BIGINT) AS sv, "
            f"min(s) AS mn, max(s) AS mx, "
            f"CAST(count(v) AS BIGINT) AS nv "
            f"FROM {t} WHERE {_pred(rng)} GROUP BY k "
            f"HAVING count(*) > {rng.randint(0, 2)}"
        )
    if kind == 2:  # join
        t2 = f"rt{rng.randrange(N_TABLES)}"
        return (
            f"SELECT a.k AS k, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(coalesce(a.v, 0) + coalesce(b.v, 0)) AS BIGINT) AS sv "
            f"FROM {t} a JOIN {t2} b ON a.k = b.k "
            f"WHERE {_pred(rng).replace('k ', 'a.k ').replace('v ', 'a.v ').replace('s ', 'a.s ')} "
            f"GROUP BY a.k"
        )
    if kind == 5:  # window functions over deterministic ordering
        return (
            f"SELECT k, v, "
            f"CAST(row_number() OVER w AS BIGINT) AS rn, "
            f"CAST(sum(coalesce(v, 0)) OVER (PARTITION BY k ORDER BY v NULLS FIRST, s NULLS FIRST "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum, "
            f"lag(s) OVER w AS prev_s "
            f"FROM {t} WHERE {_pred(rng)} "
            f"WINDOW w AS (PARTITION BY k ORDER BY v NULLS FIRST, s NULLS FIRST)"
        )
    if kind == 6:  # rollup aggregation (multi-grouping)
        # no WHERE: Spark and DuckDB disagree on ROLLUP over EMPTY input
        # (DuckDB emits the ANSI grand-total row, Spark emits nothing) —
        # a documented engine divergence, see COVERAGE.md Known gaps
        return (
            f"SELECT k, s, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(coalesce(v, 0)) AS BIGINT) AS sv "
            f"FROM {t} GROUP BY ROLLUP(k, s)"
        )
    if kind == 3:  # distinct + set op
        t2 = f"rt{rng.randrange(N_TABLES)}"
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT DISTINCT k FROM {t} WHERE {_pred(rng)} "
            f"{op} SELECT DISTINCT k FROM {t2}"
        )
    # sort + limit (deterministic tiebreak)
    return (
        f"SELECT k, v, s FROM {t} WHERE {_pred(rng)} "
        f"ORDER BY k, v NULLS FIRST, s NULLS FIRST LIMIT {rng.randint(1, 30)}"
    )


@pytest.fixture(scope="module")
def engines(spark):
    rng = random.Random(42)
    tables = _gen_tables(rng)
    con = duckdb.connect()
    for name, rows in tables.items():
        spark.createDataFrame(rows, "k bigint, v bigint, s string").createOrReplaceTempView(
            name
        )
        con.execute(f"CREATE TABLE {name} (k BIGINT, v BIGINT, s VARCHAR)")
        con.executemany(f"INSERT INTO {name} VALUES (?, ?, ?)", rows)
    return spark, con, rng


def test_randomized_queries_match_duckdb(engines):
    spark, con, rng = engines
    failures = []
    for qi in range(N_QUERIES):
        sql = _gen_query(rng)
        try:
            srows = sorted(
                [tuple(r) for r in spark.sql(sql).collect()], key=repr
            )
            drows = sorted([tuple(r) for r in con.execute(sql).fetchall()], key=repr)
        except Exception as e:  # engine rejected the common-subset query
            failures.append((qi, sql, f"error: {e}"))
            continue
        if srows != drows:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
            failures.append((qi, sql, f"{len(srows)} vs {len(drows)} rows; {diff}"))
    assert not failures, "\n".join(
        f"[{qi}] {sql}\n  -> {info}" for qi, sql, info in failures[:5]
    )


def test_rollup_empty_input_shim_matches_duckdb(engines):
    """The documented empty-input ROLLUP divergence, made compatible:
    ansi_rollup unions the grand-total row exactly when Spark's rollup
    emits nothing. Randomized predicates INCLUDING empty selections now
    match DuckDB row-for-row (the base fuzzer must keep WHERE out of its
    rollup case; this one puts it back with the shim on)."""
    from ytsaurus_spark.queries.aggregates import ansi_rollup

    spark, con, rng = engines
    failures = []
    for qi in range(60):
        t = f"rt{rng.randrange(N_TABLES)}"
        pred = _pred(rng)
        if qi % 7 == 0:
            pred = "k > 999999"  # force the empty-input corner explicitly
        sql = (
            f"SELECT k, s, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(coalesce(v, 0)) AS BIGINT) AS sv "
            f"FROM {t} WHERE {pred} GROUP BY ROLLUP(k, s)"
        )
        aggs = [
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("v", F.lit(0))).cast("long").alias("sv"),
        ]
        sdf = ansi_rollup(
            spark.table(t).filter(F.expr(pred)), ["k", "s"], aggs
        )
        srows = sorted([tuple(r) for r in sdf.collect()], key=repr)
        drows = sorted([tuple(r) for r in con.execute(sql).fetchall()], key=repr)
        if srows != drows:
            failures.append((qi, sql, f"{len(srows)} vs {len(drows)}"))
    assert not failures, failures[:5]
