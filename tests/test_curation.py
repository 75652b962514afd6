"""Unit tests for the corpus-curation operators on micro-fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ytsaurus_spark.operators import curation


@pytest.fixture()
def docs(spark):
    # 4-char tokens → est tokens = ceil(len/4) is easy to reason about.
    return spark.createDataFrame(
        [
            (0, "aaaa bbbb cccc dddd", "en", "s0"),   # 5 est tokens (19 chars)
            (1, "eeee ffff gggg hhhh", "en", "s0"),   # 5
            (2, "iiii jjjj", "en", "s1"),             # 3 (9 chars)
            (3, "aaaa bbbb cccc dddd", "en", "s1"),   # dup of 0
        ],
        "doc_id bigint, text string, lang string, source string",
    )


def test_pack_sequences_bins_and_order(docs):
    packed = curation.pack_sequences(docs, budget=8)
    rows = {r.doc_id: (r["__tok"], r.bin_id) for r in packed.collect()}
    # cumulative: doc0 [0,5) bin0; doc1 [5,10) starts at 5 -> bin0;
    # doc2 [10,13) -> bin1; doc3 [13,18) -> bin1
    assert rows[0] == (5, 0)
    assert rows[1] == (5, 0)
    assert rows[2] == (3, 1)
    assert rows[3] == (5, 1)
    summ = {r.bin_id: (r.n_docs, r.tokens) for r in
            curation.pack_bins_summary(packed, 8).collect()}
    assert summ[0] == (2, 10) and summ[1] == (2, 8)


def test_pack_sequences_matches_single_partition_cumsum(spark):
    # Property: bin assignment is partitioning-invariant (two-phase prefix
    # sum == the naive global window). 100 docs, random-ish lengths.
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.repeat(F.lit("x"), ((F.col("id") * 37) % 97 + 1).cast("int")).alias("text"),
    )
    got = {
        (r.doc_id, r.bin_id)
        for r in curation.pack_sequences(docs, budget=50).collect()
    }
    rows = sorted(
        (r.doc_id, -(-len(r.text) // 4)) for r in docs.collect()
    )
    cum, want = 0, set()
    for doc_id, tok in rows:
        want.add((doc_id, cum // 50))
        cum += tok
    assert got == want


def test_contamination_check(docs):
    bench = docs.filter(F.col("doc_id") == 3)   # same text as doc 0
    train = docs.filter(F.col("doc_id") < 3)
    hits = {r.doc_id: r.n_shared for r in
            curation.contamination_check(train, bench, k=2).collect()}
    assert 0 in hits and hits[0] == 3           # three shared 2-grams
    assert 1 not in hits and 2 not in hits


def test_pii_scrub_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at bob.smith@corp.io or 555-0199 ref 1234567 end"),
         (2, "nothing sensitive here")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.n_redactions for r in curation.pii_scrub(df).collect()}
    assert out[1] == 3 and out[2] == 0
    scrubbed = curation.pii_scrub(df).collect()
    assert all(len(r.scrubbed_md5) == 32 for r in scrubbed)


def test_stratified_sample_deterministic_and_rate(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    kept = curation.stratified_sample(docs, {"a": 10, "b": 100})
    counts = {r.source: r.c for r in
              kept.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts["b"] == 1000                  # rate 100 keeps everything
    assert 40 <= counts["a"] <= 160             # ~10% of 1000
    # determinism: second run keeps the identical id set
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {r.doc_id for r in
            curation.stratified_sample(docs, {"a": 10, "b": 100}).collect()}
    assert ids1 == ids2


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam eggs"), (2, "all words here differ fully")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.top_count, r.n_tokens, r.top_ratio)
           for r in curation.repetition_stats(df).collect()}
    assert out[1] == (4, 5, 0.8)
    assert out[2] == (1, 5, 0.2)


def test_train_mix_weights_equalize(docs):
    out = {r.source: (r.tokens, r.weight) for r in
           curation.train_mix_weights(docs).collect()}
    # s0: 5+5=10 tokens, s1: 3+5=8 tokens, target = 9 each
    assert out["s0"][0] == 10 and out["s1"][0] == 8
    assert out["s0"][1] == pytest.approx(0.9)
    assert out["s1"][1] == pytest.approx(1.125)


def test_prefix_sum_property_random_keys(spark):
    # Hierarchical prefix_sum must equal the naive exclusive cumsum over
    # strictly-smaller keys for ANY key set — negative keys, gaps, and
    # block-boundary keys included (the shapes the exact floor-div block
    # derivation exists for). Randomized but seeded; small block size
    # forces multi-level hierarchy.
    import random

    from ytsaurus_spark.operators.curation import prefix_sum

    rng = random.Random(9)
    keys = rng.sample(range(-50_000, 50_000), 300) + [0, -1, 4096, 8191, -4096]
    rows = [(k, rng.randint(1, 9)) for k in set(keys)]
    df = spark.createDataFrame(rows, "k bigint, c bigint")
    got = {
        r.k: r.out
        for r in prefix_sum(df, "k", "c", "out", block=16).collect()
    }
    srt = sorted(rows)
    acc = 0
    for k, c in srt:
        assert got[k] == acc, (k, got[k], acc)
        acc += c


def test_select_to_budget_prefix_cut(spark):
    # four docs, diversity priority: doc 1 all-distinct, doc 4 all-same
    rows = [
        (1, "a b c d", 16),
        (2, "a b c c", 16),
        (3, "a a b b", 16),
        (4, "a a a a", 16),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")
    from ytsaurus_spark.operators import curation

    # total est tokens = 4 * ceil(16/4) = 16; budget_denom=2 -> budget 8
    out = curation.select_to_budget(df, budget_denom=2).collect()
    kept = sorted(r.doc_id for r in out)
    assert kept == [1, 2]  # highest-TTR prefix that fits
    cums = {r.doc_id: r.cum_tokens for r in out}
    assert cums[1] == 4 and cums[2] == 8


def test_paragraph_dedup_reassembly(spark):
    from ytsaurus_spark.operators.curation import paragraph_dedup

    # doc 1 and 2 share an identical first chunk (8 chars at chunk_chars=8);
    # doc 2's copy must drop, its unique tail must survive in offset order
    docs = spark.createDataFrame(
        [(1, "AAAABBBBCCCCDDDD"), (2, "AAAABBBBEEEEFFFF"), (3, "GGGG")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs, chunk_chars=8).collect()}
    assert out[1].clean_text == "AAAABBBBCCCCDDDD" and out[1].n_dropped == 0
    assert out[2].clean_text == "EEEEFFFF" and out[2].n_dropped == 1
    assert out[2].n_chunks == 2
    assert out[3].clean_text == "GGGG"  # short doc, single whole-text chunk

    # fully-duplicate doc collapses to empty remainder
    docs2 = spark.createDataFrame(
        [(1, "XXXXYYYY"), (2, "XXXXYYYY")], ["doc_id", "text"]
    )
    out2 = {r.doc_id: r for r in paragraph_dedup(docs2, chunk_chars=8).collect()}
    assert out2[1].clean_text == "XXXXYYYY"
    assert out2[2].clean_text == "" and out2[2].n_dropped == 1


def test_source_cap_matches_unsalted_rank(spark):
    # Property: the salted two-phase top-k equals the plain unsalted
    # row_number rank, including on a skewed corpus (one mega-source)
    # and under n_chars ties (tie-break by doc_id).
    rows = [(i, f"s{0 if i < 40 else i % 3}", (i * 7) % 11) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    got = {
        r.doc_id: r.kept
        for r in curation.source_cap(docs, cap=5, salt_buckets=4).collect()
    }
    import itertools

    expected = {}
    by_src = sorted(rows, key=lambda t: t[1])
    for _, grp in itertools.groupby(by_src, key=lambda t: t[1]):
        ranked = sorted(grp, key=lambda t: (-t[2], t[0]))
        for rk, (doc_id, _, _) in enumerate(ranked, start=1):
            expected[doc_id] = rk <= 5
    assert got == expected
    assert sum(got.values()) == 5 * 3  # 3 sources, 5 kept each


def test_source_cap_cap_larger_than_source(spark):
    docs = spark.createDataFrame(
        [(i, "only", i) for i in range(4)],
        "doc_id bigint, source string, n_chars bigint",
    )
    out = curation.source_cap(docs, cap=10, salt_buckets=3).collect()
    assert all(r.kept for r in out) and len(out) == 4


def test_filter_attrition_waterfall(spark):
    from ytsaurus_spark.operators.curation import filter_attrition

    rows = [
        (True, True, True),    # survives all
        (False, True, True),   # dies at g1
        (True, False, False),  # dies at g2 (never evaluated at g3)
        (True, True, False),   # dies at g3
        (False, False, False), # dies at g1 only
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    out = {r.stage: r for r in filter_attrition(df, ["a", "b", "c"]).collect()}
    assert (out[1].n_in, out[1].n_fail, out[1].n_out) == (5, 2, 3)
    assert (out[2].n_in, out[2].n_fail, out[2].n_out) == (3, 1, 2)
    assert (out[3].n_in, out[3].n_fail, out[3].n_out) == (2, 1, 1)
    assert out[1].fail_ppm == 400000
    assert out[2].fail_ppm == 333333
    assert out[3].fail_ppm == 500000
    assert out[1].gate == "a" and out[3].gate == "c"


def test_filter_attrition_conserves_flow(spark, sf_dir):
    """n_out of stage i must equal n_in of stage i+1 and the final
    n_out must equal the count of docs passing every Gopher gate."""
    from ytsaurus_spark.operators.curation import filter_attrition
    from ytsaurus_spark.operators.text import gopher_rules
    from ytsaurus_spark.catalog import load_tables

    cat = load_tables(spark, sf_dir)
    flags = gopher_rules(cat.read("documents")).persist()
    gates = ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
             "ok_bullets", "ok_ellipsis", "ok_alpha", "ok_stopwords"]
    out = sorted(filter_attrition(flags, gates).collect(),
                 key=lambda r: r.stage)
    for a, b in zip(out, out[1:]):
        assert a.n_out == b.n_in
    n_pass = flags.filter("passes").count()
    assert out[-1].n_out == n_pass
    assert out[0].n_in == flags.count()


def test_dsir_select_matches_bruteforce(spark):
    """dsir_select vs a pure-Python twin: same md5 buckets, same add-1
    whole-bit weights, same deterministic top-k."""
    import hashlib

    docs = [
        (1, "the cat sat on the mat", True),
        (2, "a dog ran in the park", True),
        (3, "the cat sat on a log", False),
        (4, "quantum flux capacitor array", False),
        (5, "the dog sat on the mat", False),
        (6, "unrelated tokens entirely here", False),
        (7, "cat dog cat dog cat", False),
    ]
    B = 16

    def grams(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    from collections import Counter

    tc, rc = Counter(), Counter()
    per_doc = {}
    for did, text, is_t in docs:
        c = Counter(bucket(g) for g in grams(text))
        per_doc[did] = (c, is_t)
        (tc if is_t else rc).update(c)

    def flog2(n):
        return n.bit_length() - 1

    T, R = sum(tc.values()), sum(rc.values())
    norm = flog2(R + B) - flog2(T + B)
    expected = {}
    for did, (c, is_t) in per_doc.items():
        if is_t:
            continue
        expected[did] = sum(
            n * (flog2(tc[b] + 1) - flog2(rc[b] + 1)) for b, n in c.items()
        ) + sum(c.values()) * norm
    want = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    df = spark.createDataFrame(
        [(d, t) for d, t, _ in docs], "doc_id bigint, text string"
    )
    got = curation.dsir_select(
        df,
        target_pred=F.col("doc_id") <= 2,
        num_buckets=B,
        top_k=3,
    ).collect()
    assert [(r.doc_id, r.dsir_score) for r in got] == want
