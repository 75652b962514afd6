"""Cross-engine rounding determinism (the tpch_q9 hash-flake class).

The driver's correctness gate hashes EXACT value reprs of Spark vs DuckDB
output. ``round(double, n)`` diverges between engines when the operand's
exact decimal terminates with a 5 at the rounding digit: Spark rounds the
shortest decimal repr half-up, DuckDB rounds the binary value — a
coin-flip on every representable half boundary (round-4 driver red:
tpch_q9, 5 of 175 groups on an exact half-cent).

The registry-wide fix is half-up FLOOR arithmetic over exact integer
scaled sums: every operation (integer sum, correctly-rounded IEEE
division, +0.5, floor) is bit-deterministic given identical inputs, so
both engines must produce the identical double. These tests pin that
property with exact-repr comparison (NOT the 9-digit-rounded comparison
the local gate uses), over adversarial tie values and randomized group
perturbations.
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


def _norm(v):
    """Driver-style normalization: DECIMAL → float (Spark parses `100.0`
    literals as DECIMAL, DuckDB division yields DOUBLE; the driver's
    value hash compares them post-conversion — q53/q63 passed round 4
    with exactly this type split)."""
    import decimal

    return float(v) if isinstance(v, decimal.Decimal) else v


def _spark_round_cents(spark, sums):
    df = spark.createDataFrame([(int(s),) for s in sums], "sum_tt long")
    out = df.selectExpr(
        "CAST(floor(CAST(sum_tt AS BIGINT) / 100.0 + 0.5) AS BIGINT)"
        " / 100.0 AS v"
    ).collect()
    return [_norm(r["v"]) for r in out]


def _duck_round_cents(sums):
    con = duckdb.connect()
    out = []
    for s in sums:
        (v,) = con.execute(
            f"SELECT CAST(floor(CAST({s} AS BIGINT) / 100.0 + 0.5) AS BIGINT)"
            " / 100.0"
        ).fetchone()
        out.append(v)
    return out


def test_half_up_floor_exact_repr_parity(spark):
    """Exact-repr equality on adversarial half-cent ties in both engines."""
    sv = _spark_round_cents(spark, TIE_SUMS)
    dv = _duck_round_cents(TIE_SUMS)
    for s, a, b in zip(TIE_SUMS, sv, dv):
        assert repr(a) == repr(b), f"sum_tt={s}: spark={a!r} duck={b!r}"


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
    """VERDICT r4 item 1's 'done' bar: perturb group membership — moving
    rows between groups changes each group's exact integer sum, and the
    rounded output must remain the pure half-up function of that sum,
    identical in both engines, for every perturbation."""
    rng = random.Random(9)
    # amounts in ten-thousandths, biased to produce …50 tie sums often
    amounts = [rng.randrange(-10**9, 10**9) for _ in range(500)]
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
    """The avg/ratio species (q17 avg_yearly, ql_group_agg avgs):
    floor(int * 100.0 / denom + 0.5) is engine-identical."""
    con = duckdb.connect()
    vals = [700035, 700000, 35, 5, 0, 123456789, 2**45 + 5]
    df = spark.createDataFrame([(int(v),) for v in vals], "c long")
    sv = [
        _norm(r["v"])
        for r in df.selectExpr(
            f"CAST(floor(CAST(c AS BIGINT) * 100.0 / {denom} + 0.5)"
            " AS BIGINT) / 10000.0 AS v"
        ).collect()
    ]
    dv = [
        con.execute(
            f"SELECT CAST(floor(CAST({v} AS BIGINT) * 100.0 / {denom} + 0.5)"
            " AS BIGINT) / 10000.0"
        ).fetchone()[0]
        for v in vals
    ]
    assert [repr(a) for a in sv] == [repr(b) for b in dv]
