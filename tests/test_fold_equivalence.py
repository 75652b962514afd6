"""Randomized differential tests for the round-6 scan-fold rewrites.

Each multi-scan query shape was folded into a single-pass form (conditional
pivot, order-grain aggregate, OR-merged branches). The DuckDB oracles pin
them on the fixture; these tests pin the ALGEBRAIC equivalence itself on
randomized inputs, so a future edit that breaks a fold's edge case (empty
channel, all-null cell, single-supplier order) fails even if the fixture
happens not to exercise it. Mirrors the reference's randomized-equivalence
test style (SURVEY.md §5).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _rows(seed: int, n: int = 400):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(30),        # key (item / order)
            rng.randrange(3),         # channel 0/1/2
            rng.randrange(8),         # supplier
            rng.choice(["R", "N", "A"]),  # returnflag
            rng.randrange(1, 50),     # quantity
        )
        for _ in range(n)
    ]


SCHEMA = "k long, ch int, supp int, rf string, qty long"


def test_pivot_fold_equals_self_join(spark):
    """q58/q83 shape: per-key conditional sums with all-cells-non-null ≡
    the three-way inner self-join of per-(key, channel) aggregates."""
    for seed in (1, 2, 3):
        df = spark.createDataFrame(_rows(seed), SCHEMA)
        # folded form
        cell = lambda c: F.sum(F.when(F.col("ch") == c, F.col("qty")))  # noqa: E731
        folded = (
            df.groupBy("k")
            .agg(cell(0).alias("a"), cell(1).alias("b"), cell(2).alias("c"))
            .filter(
                F.col("a").isNotNull()
                & F.col("b").isNotNull()
                & F.col("c").isNotNull()
            )
        )
        # self-join form
        per = df.groupBy("k", "ch").agg(F.sum("qty").alias("q"))
        pick = lambda c, n: per.filter(F.col("ch") == c).select(  # noqa: E731
            F.col("k").alias(f"k{n}"), F.col("q").alias(n)
        )
        joined = (
            pick(0, "a")
            .join(pick(1, "b"), F.col("ka") == F.col("kb"))
            .join(pick(2, "c"), F.col("ka") == F.col("kc"))
            .select(F.col("ka").alias("k"), "a", "b", "c")
        )
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, joined.collect())
        ), f"seed {seed}"


def test_exists_fold_equals_semi_anti(spark):
    """q21 shape: for a returning row, EXISTS(other supplier in the key)
    ∧ NOT EXISTS(other RETURNING supplier) ≡ per-key distinct-supplier
    count ≥ 2 ∧ distinct-returning-supplier count == 1."""
    for seed in (4, 5, 6):
        df = spark.createDataFrame(_rows(seed), SCHEMA)
        # folded form
        per = df.groupBy("k").agg(
            F.count_distinct("supp").alias("ns"),
            F.count_distinct(
                F.when(F.col("rf") == "R", F.col("supp"))
            ).alias("nrs"),
        )
        folded = (
            df.filter(F.col("rf") == "R")
            .join(per, "k")
            .filter((F.col("ns") > 1) & (F.col("nrs") == 1))
            .groupBy("supp")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # literal EXISTS / NOT EXISTS form
        df.createOrReplaceTempView(f"t{seed}")
        literal = spark.sql(
            f"""
            SELECT l1.supp AS supp, count(*) AS n FROM t{seed} l1
            WHERE l1.rf = 'R'
              AND EXISTS (SELECT 1 FROM t{seed} l2
                          WHERE l2.k = l1.k AND l2.supp <> l1.supp)
              AND NOT EXISTS (SELECT 1 FROM t{seed} l3
                              WHERE l3.k = l1.k AND l3.supp <> l1.supp
                                AND l3.rf = 'R')
            GROUP BY l1.supp
            """
        )
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, literal.collect())
        ), f"seed {seed}"


def test_band_fold_equals_independent_counts(spark):
    """q88 shape: one conditional aggregation over disjoint bands ≡ N
    independently filtered counts."""
    for seed in (7, 8):
        df = spark.createDataFrame(_rows(seed), SCHEMA)
        bands = [(0, 9), (10, 24), (25, 49)]
        folded = df.agg(
            *[
                F.count(
                    F.when(F.col("qty").between(lo, hi), 1)
                ).alias(f"b{lo}")
                for lo, hi in bands
            ]
        ).collect()[0]
        for lo, hi in bands:
            independent = df.filter(F.col("qty").between(lo, hi)).count()
            assert folded[f"b{lo}"] == independent, f"seed {seed} band {lo}"


def test_union_fold_equals_channel_branches(spark):
    """q33/q56/q60 shape: (dim, channel) partials re-summed per dim ≡
    per-channel aggregates UNION ALLed then re-aggregated — including
    dims present in only SOME channels."""
    for seed in (9, 10):
        df = spark.createDataFrame(_rows(seed), SCHEMA)
        folded = (
            df.groupBy("k", "ch")
            .agg(F.sum("qty").alias("t"))
            .groupBy("k")
            .agg(F.sum("t").alias("total"))
        )
        per = lambda c: (  # noqa: E731
            df.filter(F.col("ch") == c)
            .groupBy("k")
            .agg(F.sum("qty").alias("t"))
        )
        union = (
            per(0)
            .unionAll(per(1))
            .unionAll(per(2))
            .groupBy("k")
            .agg(F.sum("t").alias("total"))
        )
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, union.collect())
        ), f"seed {seed}"
