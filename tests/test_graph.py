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

def _random_graph(n: int, m: int, seed: int):
    import random

    rng = random.Random(seed)
    return list({tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)})


def _union_find_components(n: int, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_converged_matches_union_find(spark, seed):
    from ytsaurus_spark.operators.graph import connected_components

    edges = _random_graph(60, 45, seed)  # sparse -> many components
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.comp
        for r in connected_components(df, converge=True).collect()
    }
    want = _union_find_components(60, edges)
    # only nodes with at least one edge appear in the operator output;
    # the min-label must equal the component minimum for every one
    comp_min = {}
    for v, root in want.items():
        comp_min.setdefault(root, []).append(v)
    expect = {
        v: min(members)
        for root, members in comp_min.items()
        for v in members
        if len(members) > 1 or any(v in e for e in edges)
    }
    for node, comp in got.items():
        assert comp == expect[node], (node, comp, expect[node])


def test_connected_components_bounded_rounds_is_k_hop_min(spark):
    from ytsaurus_spark.operators.graph import connected_components

    # path graph 0-1-2-3-4-5: after 2 rounds node 5 sees min within 2 hops = 3
    edges = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.comp for r in connected_components(df, iterations=2).collect()}
    assert got[5] == 3 and got[2] == 0 and got[0] == 0
    got4 = {r.node: r.comp for r in connected_components(df, iterations=4).collect()}
    assert got4[5] == 1  # 4 hops from 5 reaches 1, not yet 0
    gotc = {r.node: r.comp for r in connected_components(df, converge=True).collect()}
    assert set(gotc.values()) == {0}


@pytest.mark.parametrize("seed", [0, 7])
def test_triangle_count_matches_brute_force(spark, seed):
    from itertools import combinations

    from ytsaurus_spark.operators.graph import triangle_count

    edges = _random_graph(25, 90, seed)  # dense enough for triangles
    es = set(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_tri for r in triangle_count(df).collect()}
    want = {}
    for a, b, c in combinations(range(25), 3):
        if (
            tuple(sorted((a, b))) in es
            and tuple(sorted((b, c))) in es
            and tuple(sorted((a, c))) in es
        ):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


def test_bfs_layers_path_graph(spark):
    from ytsaurus_spark.operators.graph import bfs_layers

    edges = [(i, i + 1) for i in range(6)]  # path 0-1-2-3-4-5-6
    df = spark.createDataFrame(edges, ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.dist for r in bfs_layers(df, srcs, rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # nodes beyond 3 hops absent

    srcs2 = spark.createDataFrame([(0,), (6,)], ["node"])
    got2 = {r.node: r.dist for r in bfs_layers(df, srcs2, rounds=3).collect()}
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 3, 6: 0, 5: 1, 4: 2}


def test_sssp_weighted_matches_dijkstra(spark):
    """Bounded Bellman-Ford vs a reference Dijkstra on a weighted path
    graph where the cheap route needs MORE hops than the direct edge."""
    import heapq

    from ytsaurus_spark.operators.graph import sssp_weighted

    #   0 -10- 1 -1- 2 -1- 3      direct 0-3 edge costs 20: the 3-hop
    #   0 --------20------- 3      12-cost path must win
    edges = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 1), (2, 3, 1), (0, 3, 20)],
        "src bigint, dst bigint, w bigint",
    )
    sources = spark.createDataFrame([(0,)], "node bigint")
    got = {
        r.node: r.dist
        for r in sssp_weighted(edges, sources, rounds=4).collect()
    }

    adj = {}
    for s, d, w in [(0, 1, 10), (1, 2, 1), (2, 3, 1), (0, 3, 20)]:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist, heap = {0: 0}, [(0, 0)]
    while heap:
        c, u = heapq.heappop(heap)
        if c > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            if c + w < dist.get(v, float("inf")):
                dist[v] = c + w
                heapq.heappush(heap, (c + w, v))
    assert got == dist
    assert got[3] == 12  # the longer-hop cheaper path won


def test_label_propagation_two_triangles(spark):
    from ytsaurus_spark.operators.graph import label_propagation

    # Two triangles bridged at 2-3: after 3 deterministic rounds the
    # left triangle converges to label 0 and the right to label 2
    # (hand-unrolled: r1=[1,0,0,2,3,3], r2=[0,0,0,3,2,2],
    # r3=[0,0,0,2,2,2]).
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        "src bigint, dst bigint",
    )
    got = {r.node: r.label for r in label_propagation(edges, 3).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}


def test_jaccard_link_prediction_bruteforce(spark):
    from itertools import combinations

    from ytsaurus_spark.operators.graph import jaccard_link_prediction

    # Deterministic sparse graph on 12 nodes.
    edges = [(i, (i * i + 3) % 12) for i in range(12)] + [
        (i, (i + 4) % 12) for i in range(0, 12, 2)
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src bigint, dst bigint"
    )
    got = {
        (r.src, r.dst): r
        for r in jaccard_link_prediction(df, min_common=1).collect()
    }
    # Python brute force.
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbr = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    want = {}
    for u, v in combinations(sorted(nbr), 2):
        if (u, v) in und:
            continue
        common = len(nbr[u] & nbr[v])
        if common >= 1:
            want[(u, v)] = (common, len(nbr[u]), len(nbr[v]))
    assert set(got) == set(want)
    for (u, v), (common, du, dv) in want.items():
        r = got[(u, v)]
        assert (r.common, r.deg_src, r.deg_dst) == (common, du, dv)
        assert r.jaccard == int(common * 1e6 / (du + dv - common) + 0.5) / 1e6


def test_jaccard_link_prediction_max_degree_drops_hub(spark):
    from ytsaurus_spark.operators.graph import jaccard_link_prediction

    # Star through hub 0 (degree 4) plus one wedge through node 9.
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (9, 1), (9, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    full = {
        (r.src, r.dst): r.common
        for r in jaccard_link_prediction(df, min_common=1).collect()
    }
    assert full[(1, 2)] == 2  # via hub 0 AND via 9
    assert full[(3, 4)] == 1  # via hub only
    capped = {
        (r.src, r.dst): r.common
        for r in jaccard_link_prediction(
            df, min_common=1, max_degree=3
        ).collect()
    }
    assert capped[(1, 2)] == 1  # hub wedges gone, node-9 wedge stays
    assert (3, 4) not in capped


def test_kcore_matches_full_peel_on_converged_graph(spark):
    from ytsaurus_spark.operators.graph import kcore

    # Clique K4 (a 3-core) + a tail path that peels away in <=3 rounds.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.deg for r in kcore(df, k=3, rounds=4).collect()}
    # True 3-core = the K4; inside it every node has degree 3.
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_bounded_round_semantics(spark):
    from ytsaurus_spark.operators.graph import kcore

    # A long path under k=2 peels one endpoint pair per round: after
    # r rounds the survivors are the nodes > r hops from both ends —
    # bounded rounds keep exactly the unrolled-depth set.
    n = 10
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    surv2 = {r.node for r in kcore(df, k=2, rounds=2).collect()}
    assert surv2 == set(range(2, n - 1))
    surv4 = {r.node for r in kcore(df, k=2, rounds=4).collect()}
    assert surv4 == set(range(4, n - 3))


def test_modularity_bruteforce(spark):
    import math
    from itertools import combinations

    from ytsaurus_spark.operators.graph import modularity

    # Two triangles joined by one bridge; communities = the triangles.
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    comm = [(0, 100), (1, 100), (2, 100), (3, 200), (4, 200), (5, 200)]
    e_df = spark.createDataFrame(edges, "src bigint, dst bigint")
    c_df = spark.createDataFrame(comm, "node bigint, label bigint")
    out = {r.label: r for r in modularity(e_df, c_df).collect()}
    m = len(edges)
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    labs = dict(comm)
    for lab in (100, 200):
        members = [n for n, l in comm if l == lab]
        intra = sum(1 for a, b in edges if labs[a] == lab and labs[b] == lab)
        dsum = sum(len(nbr[n]) for n in members)
        r = out[lab]
        assert (r.n_nodes, r.intra_edges, r.degree_sum) == (
            len(members), intra, dsum)
        assert r.q_num == 4 * m * intra - dsum * dsum
    qn = sum(r.q_num for r in out.values())
    want = math.floor(qn * 1e6 / (4 * m * m) + 0.5) / 1e6
    assert all(r.modularity == want for r in out.values())
    # Sanity: this partition is strongly modular.
    assert want > 0.3


def test_modularity_trivial_partition_is_zero(spark):
    from ytsaurus_spark.operators.graph import modularity

    # Everything in ONE community: Q = m/m - (2m/2m)^2 = 0 exactly.
    edges = [(0, 1), (1, 2), (2, 3)]
    comm = [(n, 7) for n in range(4)]
    e_df = spark.createDataFrame(edges, "src bigint, dst bigint")
    c_df = spark.createDataFrame(comm, "node bigint, label bigint")
    rows = modularity(e_df, c_df).collect()
    assert len(rows) == 1 and rows[0].modularity == 0.0


def test_assortativity_star_is_negative(spark):
    from ytsaurus_spark.operators.graph import assortativity

    # Star graph: perfectly disassortative (r = -1).
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    r = assortativity(df).collect()[0]
    assert r.n_edges == 5
    assert r.r == -1.0


def test_clustering_coefficient_known_graphs(spark):
    from ytsaurus_spark.operators.graph import clustering_coefficient

    # Complete graph K4: transitivity exactly 1.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "src bigint, dst bigint")
    r = clustering_coefficient(df).collect()[0]
    assert (r.n_triangles, r.n_wedges, r.coeff) == (4, 12, 1.0)
    # Path graph: no triangles at all.
    path = [(i, i + 1) for i in range(4)]
    df2 = spark.createDataFrame(path, "src bigint, dst bigint")
    r2 = clustering_coefficient(df2).collect()[0]
    assert (r2.n_triangles, r2.coeff) == (0, 0.0)


def test_symmetrized_cache_partitioning_feeds_round_join_in_place(spark):
    """The loop-invariant adjacency persists PRE-PARTITIONED on the
    per-round join key (r11 optimization): a round's equi-join on ``u``
    must consume the cached symmetric edge list IN PLACE — no Exchange
    between the join and the InMemoryTableScan. Broadcast is disabled so
    the tiny fixture exercises the shuffle-join path the shape matters
    for."""
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.graph import _symmetrize

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")], ["src", "dst"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sym = _symmetrize(edges, "src", "dst")
        sym.count()  # materialize the cache
        labels = spark.createDataFrame(
            [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")],
            ["node", "comp"],
        )
        j = sym.join(labels, sym.u == labels.node).select("v", "comp")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # Everything before the first InMemoryRelation marker is the
        # query-side plan (the cache-BUILD plan, which legitimately
        # contains the one-off REPARTITION_BY_COL exchange, comes after).
        query_side = plan.split("InMemoryRelation", 1)[0]
        sym_exchanges = [
            line
            for line in query_side.splitlines()
            if "Exchange hashpartitioning(u#" in line
        ]
        assert not sym_exchanges, (
            "cached symmetric edge list was re-exchanged for the round "
            f"join:\n{plan}"
        )
        assert "InMemoryTableScan" in query_side
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        sym.unpersist()
