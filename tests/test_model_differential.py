"""Brute-force model differential tests for the round-6 operator batch.

The DuckDB oracles mirror each operator's distributed formulas; these
tests instead validate the SEMANTICS against independent pure-Python
models (naive O(n²) substring scan, literal greedy budget walk,
statistics-free median/MAD, dict-based LM counts) on seeded random
corpora — a shared-formula bug passes the oracle but fails here.
Deterministic (seed fixed), so failures reproduce.
"""

from __future__ import annotations

import random

from ytsaurus_spark.operators import curation, dedup, text, timeseries

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _random_corpus(rng: random.Random, n_docs: int = 30):
    docs = []
    for i in range(n_docs):
        n = rng.randint(2, 24)
        toks = [rng.choice(WORDS) for _ in range(n)]
        docs.append((i, " ".join(toks)))
    # plant a shared passage in a few docs so duplication exists
    passage = [rng.choice(WORDS) for _ in range(9)]
    for i in rng.sample(range(n_docs), 4):
        did, txt = docs[i]
        docs[i] = (did, " ".join(passage) + " " + txt)
    return docs


def test_exact_substring_vs_bruteforce(spark):
    rng = random.Random(1234)
    docs = _random_corpus(rng)
    L = 8
    # model: every L-gram occurrence position, gram -> global count
    from collections import Counter

    grams = Counter()
    positions = {}
    for did, txt in docs:
        t = txt.split(" ")
        pos = [(i, tuple(t[i:i + L])) for i in range(len(t) - L + 1)]
        positions[did] = pos
        for _, g in pos:
            grams[g] += 1
    expected = {}
    for did, txt in docs:
        covered = set()
        for i, g in positions.get(did, []):
            if grams[g] >= 2:
                covered.update(range(i, i + L))
        expected[did] = (len(txt.split(" ")), len(covered))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in dedup.exact_substring_coverage(df, gram_len=L).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in expected.values())  # the plant worked


def test_select_to_budget_vs_greedy_walk(spark):
    rng = random.Random(99)
    rows = []
    for i in range(40):
        n = rng.randint(1, 30)
        toks = [rng.choice(WORDS) for _ in range(n)]
        txt = " ".join(toks)
        rows.append((i, txt, len(txt)))
    # model: rank by (ttr_scaled desc, id asc), prefix-cut on cum est tokens
    scored = []
    for i, txt, n_chars in rows:
        t = txt.split(" ")
        pri = (len(set(t)) * 1000000) // len(t)
        est = (n_chars + 3) // 4
        scored.append((i, pri, est))
    total = sum(e for _, _, e in scored)
    budget = total // 10
    cum, keep = 0, set()
    for i, pri, est in sorted(scored, key=lambda x: (-x[1], x[0])):
        cum += est
        if cum <= budget:
            keep.add(i)
    df = spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")
    got = {r.doc_id for r in curation.select_to_budget(df, budget_denom=10).collect()}
    assert got == keep


def test_mad_outliers_vs_model(spark):
    rng = random.Random(7)
    rows = []
    for eid in range(300):
        uid = rng.randint(0, 5)
        v = round(rng.uniform(0, 50), 2)
        if rng.random() < 0.05:
            v = round(rng.uniform(500, 900), 2)
        rows.append((eid, uid, v))
    # model
    from collections import defaultdict

    by_u = defaultdict(list)
    for eid, uid, v in rows:
        by_u[uid].append((round(v * 100), eid))
    expected = {}
    for uid, vals in by_u.items():
        s = sorted(vals)
        n = len(s)
        med = s[(n + 1) // 2 - 1][0]
        devs = sorted((abs(c - med), e) for c, e in vals)
        mad = devs[(n + 1) // 2 - 1][0]
        n_out = sum(1 for d, _ in devs if d > 3 * mad)
        expected[uid] = (n, med, mad, n_out)
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, value double")
    got = {
        r.user_id: (r.n, r.median_cents, r.mad_cents, r.n_outliers)
        for r in timeseries.mad_outliers(df).collect()
    }
    assert got == expected


def test_surprisal_vs_model(spark):
    rng = random.Random(5)
    docs = _random_corpus(rng, n_docs=20)
    from collections import Counter

    wc = Counter()
    for _, txt in docs:
        wc.update(txt.split(" "))
    total = sum(wc.values())

    def flog2(n: int) -> int:
        return n.bit_length() - 1

    expected = {}
    for did, txt in docs:
        t = txt.split(" ")
        bits = sum(flog2(total) - flog2(wc[w]) for w in t)
        expected[did] = (len(t), bits)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_tokens, r.total_bits)
        for r in text.unigram_surprisal(df).collect()
    }
    assert got == expected


def test_bigram_surprisal_vs_model(spark):
    rng = random.Random(6)
    docs = _random_corpus(rng, n_docs=20)
    from collections import Counter

    bg = Counter()
    ctx = Counter()
    for _, txt in docs:
        t = txt.split(" ")
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
            ctx[a] += 1

    def flog2(n: int) -> int:
        return n.bit_length() - 1

    expected = {}
    for did, txt in docs:
        t = txt.split(" ")
        pairs = list(zip(t, t[1:]))
        if not pairs:
            continue
        bits = sum(flog2(ctx[a]) - flog2(bg[(a, b)]) for a, b in pairs)
        expected[did] = (len(pairs), bits)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.total_bits)
        for r in text.bigram_surprisal(df).collect()
    }
    assert got == expected


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from ytsaurus_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=100)),
         (2, base + dt.timedelta(seconds=5000))],
        ["lid", "ts"],
    )
    right = spark.createDataFrame(
        [(10, base), (20, base + dt.timedelta(seconds=4990))],
        ["rid", "ts"],
    )
    out = {r.lid: r.rid for r in
           asof_join(left, right, on="ts", tolerance=60.0).collect()}
    assert out[1] is None   # match is 100s old > 60s tolerance
    assert out[2] == 20     # match is 10s old, kept
    out2 = {r.lid: r.rid for r in asof_join(left, right, on="ts").collect()}
    assert out2[1] == 10 and out2[2] == 20  # no tolerance: both match


def test_asof_forward_ties_and_strict(spark):
    from ytsaurus_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (2, 25)], ["lid", "ts"])
    right = spark.createDataFrame([(100, 10), (200, 30)], ["rid", "ts"])
    fwd = {r.lid: r.rid for r in
           asof_join(left, right, on="ts", direction="forward").collect()}
    assert fwd == {1: 100, 2: 200}  # equal axis matches when non-strict
    fwd_strict = {r.lid: r.rid for r in
                  asof_join(left, right, on="ts", direction="forward",
                            strict=True).collect()}
    assert fwd_strict == {1: 200, 2: 200}  # equal axis excluded
    fwd_tol = {r.lid: r.rid for r in
               asof_join(left, right, on="ts", direction="forward",
                         tolerance=4.0).collect()}
    assert fwd_tol == {1: 100, 2: None}  # 30-25=5 > 4 nulls out


def test_asof_nearest_pick_and_ties(spark):
    from ytsaurus_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (2, 21), (3, 100)], ["lid", "ts"])
    right = spark.createDataFrame([(100, 8), (200, 12), (300, 30)], ["rid", "ts"])
    got = {r.lid: r.rid for r in
           asof_join(left, right, on="ts", direction="nearest").collect()}
    # lid=1: bk at 8 (d=2) vs fw at 12 (d=2) -> tie prefers backward
    # lid=2: bk at 12 (d=9) beats fw at 30 (d=9)? both 9 -> backward
    # lid=3: only backward (30, d=70)
    assert got == {1: 100, 2: 200, 3: 300}
    got_tol = {r.lid: r.rid for r in
               asof_join(left, right, on="ts", direction="nearest",
                         tolerance=5.0).collect()}
    assert got_tol == {1: 100, 2: None, 3: None}


def test_asof_nearest_strict_excludes_exact(spark):
    from ytsaurus_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], ["lid", "ts"])
    right = spark.createDataFrame([(100, 10), (200, 13), (300, 6)], ["rid", "ts"])
    plain = {r.lid: r.rid for r in
             asof_join(left, right, on="ts", direction="nearest").collect()}
    assert plain == {1: 100}  # exact match wins at distance 0
    strict = {r.lid: r.rid for r in
              asof_join(left, right, on="ts", direction="nearest",
                        strict=True).collect()}
    assert strict == {1: 200}  # exact excluded; fw d=3 beats bk d=4
