"""Unit tests for operators/graph.py (PageRank)."""

from __future__ import annotations

import pytest

from ytsaurus_spark.operators.graph import pagerank


def test_pagerank_mass_conserved_and_ordering(spark):
    # a -> b, a -> c, b -> c; c dangling
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )
    out = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9  # dangling mass recycled
    assert out["c"] > out["b"] > 0  # c receives from both a and b


def test_pagerank_uniform_on_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    out = [r.rank for r in pagerank(edges, iterations=4).collect()]
    assert all(abs(r - 1.0 / 3.0) < 1e-9 for r in out)
