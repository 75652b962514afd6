"""Cross-engine rounding + output-type determinism (the tpch_q9 red class).

The driver's correctness gate hashes EXACT value reprs of Spark vs DuckDB
output — no normalization. Two independent hazards are pinned here:

1. ``round(double, n)`` diverges between engines when the operand's exact
   decimal terminates with a 5 at the rounding digit: Spark rounds the
   shortest decimal repr half-up, DuckDB rounds the binary value. Fix:
   half-up FLOOR arithmetic over exact integer scaled sums — every
   operation (integer sum, correctly-rounded IEEE division, +0.5, floor)
   is bit-deterministic given identical inputs.

2. Output TYPE divergence (the round-5 driver red, worth more rows than
   hazard 1 ever was): in a ``spark.sql`` body, ``x / 100.0`` parses the
   literal as DECIMAL, so the whole projection comes out DecimalType,
   while DuckDB parses ``100.0`` as DOUBLE — ``Decimal('0.02')`` vs
   ``0.02`` fails the exact-repr hash on EVERY row despite identical
   values. Fix: ``1eN``-notation literals (DOUBLE in both engines) and an
   explicit ``CAST(... AS DOUBLE)`` on the aggregate before the division.

These tests use exact-repr comparison with NO normalization — the same
comparison the driver does — over adversarial tie values and randomized
group perturbations. A Decimal leaking out of the Spark side fails here.
"""

from __future__ import annotations

import random

import duckdb
import pytest

# Adversarial integer ten-thousandths sums: exact half-cent ties (…50),
# near-ties, negatives (floor half-up rounds ties toward +inf), and the
# measured q9 tie value NATION_12/2000 = 5771784750.
TIE_SUMS = [
    5771784750,
    50,
    -50,
    150,
    -150,
    1049,
    1051,
    999999950,
    999999949,
    999999951,
    -999999950,
    123450,
    -123450,
    2**40 + 50,
    0,
]

# The registry's blessed final-projection shape: explicit DOUBLE interior
# math, 1eN literals. Identical text runs on both engines.
CENTS_EXPR = (
    "CAST(floor(CAST({v} AS DOUBLE) / 1e2 + 0.5) AS BIGINT) / 1e2"
)


def _spark_round_cents(spark, sums):
    df = spark.createDataFrame([(int(s),) for s in sums], "sum_tt long")
    out = df.selectExpr(CENTS_EXPR.format(v="sum_tt") + " AS v").collect()
    return [r["v"] for r in out]


def _duck_round_cents(sums):
    con = duckdb.connect()
    return [
        con.execute("SELECT " + CENTS_EXPR.format(v=s)).fetchone()[0]
        for s in sums
    ]


def test_half_up_floor_exact_repr_parity(spark):
    """Exact-repr equality on adversarial half-cent ties in both engines —
    and both sides must be plain Python floats (no Decimal leakage)."""
    sv = _spark_round_cents(spark, TIE_SUMS)
    dv = _duck_round_cents(TIE_SUMS)
    for s, a, b in zip(TIE_SUMS, sv, dv):
        assert type(a) is float, f"sum_tt={s}: spark emitted {type(a)}"
        assert type(b) is float, f"sum_tt={s}: duckdb emitted {type(b)}"
        assert repr(a) == repr(b), f"sum_tt={s}: spark={a!r} duck={b!r}"


def test_decimal_literal_form_is_the_hazard(spark):
    """Negative control: the PRE-fix form (``/ 100.0`` literals) emits
    DecimalType from spark.sql — the exact bug class the round-5 driver
    flagged. If Spark ever changes literal typing this test documents it."""
    import decimal

    df = spark.createDataFrame([(100,)], "sum_tt long")
    (row,) = df.selectExpr(
        "CAST(floor(CAST(sum_tt AS BIGINT) / 100.0 + 0.5) AS BIGINT)"
        " / 100.0 AS v"
    ).collect()
    assert isinstance(row["v"], decimal.Decimal)


def test_half_up_floor_is_half_up():
    """The arithmetic itself: ties round half-up (toward +inf), exact."""
    import math

    for s in TIE_SUMS:
        got = math.floor(s / 100.0 + 0.5) / 100.0
        # reference computed in exact integer arithmetic
        q, r = divmod(s, 100)  # python divmod floors, also for negatives
        want = (q + (1 if r >= 50 else 0)) / 100.0
        assert got == want, f"sum_tt={s}: got {got} want {want}"


def test_group_perturbation_never_flips(spark):
    """Perturb group membership — moving rows between groups changes each
    group's exact integer sum, and the rounded output must remain the pure
    half-up function of that sum, identical in both engines, for every
    perturbation."""
    rng = random.Random(9)
    # amounts in ten-thousandths, biased to produce …50 tie sums often
    amounts = [rng.randrange(-(10**9), 10**9) for _ in range(500)]
    amounts += [25, 25, -25, 75]  # tie makers
    for trial in range(5):
        k = rng.randrange(2, 7)
        assign = [rng.randrange(k) for _ in amounts]
        sums = [0] * k
        for a, g in zip(amounts, assign):
            sums[g] += a
        sv = _spark_round_cents(spark, sums)
        dv = _duck_round_cents(sums)
        assert [repr(v) for v in sv] == [repr(v) for v in dv], f"trial {trial}"


@pytest.mark.parametrize("denom", [7.0, 3.0])
def test_ratio_half_up_parity(spark, denom):
    """The avg/ratio species (q17 avg_yearly, ql_subquery avg_spent):
    floor(CAST(int AS DOUBLE) * 1e2 / denom + 0.5) / 1e4 is
    engine-identical AND emits DOUBLE on both sides."""
    con = duckdb.connect()
    vals = [700035, 700000, 35, 5, 0, 123456789, 2**45 + 5]
    expr = (
        "CAST(floor(CAST({v} AS DOUBLE) * 1e2 / {d} + 0.5)"
        " AS BIGINT) / 1e4"
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "c long")
    sv = [
        r["v"]
        for r in df.selectExpr(
            expr.format(v="c", d=denom) + " AS v"
        ).collect()
    ]
    dv = [
        con.execute("SELECT " + expr.format(v=v, d=denom)).fetchone()[0]
        for v in vals
    ]
    assert all(type(a) is float for a in sv)
    assert [repr(a) for a in sv] == [repr(b) for b in dv]
