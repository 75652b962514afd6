"""Tests for select_rows QL translation, keyed tables, secondary index,
as-of join, and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows_set
from ytsaurus_spark.operators.asof import asof_join
from ytsaurus_spark.operators.keyed_tables import KeyedTable
from ytsaurus_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    extract_features,
)
from ytsaurus_spark.operators.select_rows import QLSyntaxError, select_rows, translate_ql


def test_translate_ql_basics():
    sql = translate_ql("a, sum(b) AS s FROM [//home/x/t] GROUP BY a")
    assert sql == "SELECT a, sum(b) AS s FROM t GROUP BY a"


def test_translate_ql_order_by_requires_limit():
    with pytest.raises(QLSyntaxError):
        translate_ql("a FROM [//t] ORDER BY a")
    assert "LIMIT 5" in translate_ql("a FROM [//t] ORDER BY a LIMIT 5")


def test_translate_ql_function_renames():
    sql = translate_ql(
        "if_null(a, 0), is_prefix('x', s), cardinality(b) FROM [//t]"
    )
    assert "ifnull(a, 0)" in sql
    assert "startswith(s, 'x')" in sql
    assert "approx_count_distinct(b)" in sql


def test_translate_ql_literals_untouched():
    sql = translate_ql("s FROM [//t] WHERE s = 'is_null(x) [//fake]'")
    assert "'is_null(x) [//fake]'" in sql


def test_select_rows_end_to_end(spark):
    spark.createDataFrame([(1, 5), (2, 50)], "k bigint, v bigint").createOrReplaceTempView(
        "kvt"
    )
    out = select_rows(spark, "k, v FROM [//home/kvt] WHERE v > 10")
    assert rows_set(out) == {(2, 50)}


def test_keyed_table_upsert_lookup_delete(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k bigint, s string, cnt bigint"
    )
    t = KeyedTable(df=base, key_cols=["k"], aggregates={"cnt": "sum"})
    # upsert: existing key folds cnt, overwrites s; new key appends
    t2 = t.insert_rows(
        spark.createDataFrame([(1, "a2", 5), (3, "c", 7)], "k bigint, s string, cnt bigint")
    )
    assert rows_set(t2.df) == {(1, "a2", 15), (2, "b", 20), (3, "c", 7)}
    # time travel: version 0 is the pre-upsert snapshot
    assert rows_set(t2.read(0)) == rows_set(base)
    # lookup
    keys = spark.createDataFrame([(1,), (3,)], "k bigint")
    assert rows_set(t2.lookup_rows(keys).select("k")) == {(1,), (3,)}
    # delete
    t3 = t2.delete_rows(spark.createDataFrame([(2,)], "k bigint"))
    assert rows_set(t3.df.select("k")) == {(1,), (3,)}


def test_keyed_table_min_max_first_folds(spark):
    base = spark.createDataFrame([(1, 10, 10, 10)], "k bigint, lo bigint, hi bigint, fst bigint")
    t = KeyedTable(
        df=base, key_cols=["k"], aggregates={"lo": "min", "hi": "max", "fst": "first"}
    )
    t2 = t.insert_rows(
        spark.createDataFrame([(1, 5, 99, 42)], "k bigint, lo bigint, hi bigint, fst bigint")
    )
    row = t2.df.collect()[0]
    assert (row.lo, row.hi) == (5, 99)
    # "first" keeps the FIRST-WRITTEN (stored) value deterministically —
    # an upsert must never overwrite it (sorted_dynamic_store.cpp:411).
    assert row.fst == 10
    # but a stored NULL is filled by the incoming value
    t_null = KeyedTable(
        df=spark.createDataFrame([(1, None)], "k bigint, fst bigint"),
        key_cols=["k"],
        aggregates={"fst": "first"},
    )
    filled = t_null.insert_rows(
        spark.createDataFrame([(1, 7)], "k bigint, fst bigint")
    )
    assert filled.df.collect()[0].fst == 7


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 7)], "uid bigint, t bigint"
    )
    right = spark.createDataFrame(
        [(1, 5, "r5"), (1, 20, "r20"), (2, 9, "r9")], "uid bigint, t bigint, tag string"
    )
    out = asof_join(left, right, on="t", by=["uid"], right_cols=["tag"])
    got = {(r.uid, r.t): r.tag for r in out.collect()}
    assert got == {(1, 10): "r5", (1, 25): "r20", (2, 7): None}
    # tie + strict semantics
    tie_left = spark.createDataFrame([(1, 20)], "uid bigint, t bigint")
    tied = asof_join(tie_left, right, on="t", by=["uid"], right_cols=["tag"])
    assert tied.collect()[0].tag == "r20"       # inclusive by default
    strict = asof_join(tie_left, right, on="t", by=["uid"], right_cols=["tag"], strict=True)
    assert strict.collect()[0].tag == "r5"      # strictly-before


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame([(1, "abc"), (2, "a" * 100)], "doc_id bigint, text string")
    media = attach_binary(docs, "text", "doc_id")
    assert dict(media.dtypes)["media"] == "binary"
    feats = {r.id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 3
    assert feats[1].byte_sum_mod == (ord("a") + ord("b") + ord("c")) % 997
    assert feats[2].n_bytes == 100
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "image/png")


def test_keyed_table_partial_update(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k bigint, s string, cnt bigint"
    )
    t = KeyedTable(df=base, key_cols=["k"], aggregates={"cnt": "sum"})
    # partial update: only key + aggregate delta; plain column s omitted
    delta = spark.createDataFrame([(1, 5), (3, 7)], "k bigint, cnt bigint")
    t2 = t.insert_rows(delta, update=True)
    assert rows_set(t2.df) == {(1, "a", 15), (2, "b", 20), (3, None, 7)}
    # partial update: only key + plain column; aggregate omitted -> no fold
    rename = spark.createDataFrame([(2, "B")], "k bigint, s string")
    t3 = t2.insert_rows(rename, update=True)
    assert rows_set(t3.df) == {(1, "a", 15), (2, "B", 20), (3, None, 7)}
    # missing columns without update=True is an error
    with pytest.raises(ValueError):
        t.insert_rows(delta)


def test_keyed_table_pivots_and_reshard(spark):
    base = spark.createDataFrame([(i, i * 10) for i in range(100)], "k bigint, v bigint")
    t = KeyedTable(df=base, key_cols=["k"])
    pivots = t.pivot_keys(4)
    assert len(pivots) == 3 and pivots == sorted(pivots)
    resharded = t.reshard(4)
    assert resharded.rdd.getNumPartitions() == 4
    # each tablet holds a contiguous key range (ranges don't interleave)
    parts = resharded.rdd.glom().collect()
    ranges = [(p[0].k, p[-1].k) for p in parts if p]
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_select_rows_ql_offset_limit_order(spark):
    sql = translate_ql("k FROM [//t] ORDER BY k OFFSET 5 LIMIT 10")
    assert "LIMIT 10 OFFSET 5" in sql
    spark.createDataFrame([(i,) for i in range(20)], "k bigint").createOrReplaceTempView("ol")
    out = select_rows(spark, "k FROM [//x/ol] ORDER BY k OFFSET 5 LIMIT 3")
    assert [r.k for r in out.collect()] == [5, 6, 7]


def test_custom_fold_xdelta_interface(spark, tmp_path):
    """User-supplied merge fn as the aggregate fold (the xdelta fold
    interface): values merge in generation order, deterministically."""
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.keyed_tables import KeyedTable
    from ytsaurus_spark.sources.tx_table import LogTxTable

    merge = lambda acc, v: F.concat_ws("+", acc, v)  # noqa: E731

    base = spark.createDataFrame([(1, "p0"), (2, "q0")], "k bigint, patch string")
    t = KeyedTable(base, key_cols=["k"], aggregates={"patch": merge})
    t = t.insert_rows(spark.createDataFrame([(1, "p1")], "k bigint, patch string"))
    t = t.insert_rows(
        spark.createDataFrame([(1, "p2"), (2, None)], "k bigint, patch string")
    )
    got = {r.k: r.patch for r in t.df.collect()}
    assert got == {1: "p0+p1+p2", 2: "q0"}  # null delta = fold identity

    # durable layer: same fold across delta segments + tombstone reset
    lt = LogTxTable(spark, str(tmp_path / "xd"), key_cols=["k"], aggregates={"patch": merge})
    lt.init(base)
    lt.insert_rows(spark.createDataFrame([(1, "p1")], "k bigint, patch string"))
    lt.insert_rows(spark.createDataFrame([(1, "p2")], "k bigint, patch string"))
    lt.delete_rows(spark.createDataFrame([(2,)], "k bigint"))
    lt.insert_rows(spark.createDataFrame([(2, "q9")], "k bigint, patch string"))
    got = {r.k: r.patch for r in lt.read().collect()}
    assert got == {1: "p0+p1+p2", 2: "q9"}
    # history: fold state as of version 1
    got1 = {r.k: r.patch for r in lt.read(version=1).collect()}
    assert got1 == {1: "p0+p1", 2: "q0"}


def test_explain_select_rows(spark, sf_dir):
    from ytsaurus_spark.catalog import load_tables
    from ytsaurus_spark.operators.select_rows import explain_select_rows

    load_tables(spark, sf_dir).register_all()
    out = explain_select_rows(
        spark,
        "n_name, n_regionkey FROM [//home/nation] "
        "WHERE n_regionkey > 1 ORDER BY n_name ASC LIMIT 5",
    )
    assert out["query"].startswith("n_name")
    assert "SELECT" in out["translated_sql"].upper()
    # the "optimized plan" view must show pushdown + the top-k strategy,
    # which is what a reference user inspects explain_query output for
    assert "PushedFilters" in out["plan"]
    assert "GreaterThan(n_regionkey,1)" in out["plan"]
    assert "TakeOrderedAndProject" in out["plan"]


# -- Unfolding / Unique secondary indexes (ESecondaryIndexKind) -----------


def test_unfolding_index_list_contains(spark):
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.secondary_index import (
        build_unfolding_index,
        query_with_unfolding_index,
    )

    t = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c"]), (3, ["c"]), (4, [])],
        "k long, tags array<string>",
    )
    idx = build_unfolding_index(t, "tags", ["k"])
    got = query_with_unfolding_index(t, idx, ["k"], "b")
    assert sorted(r["k"] for r in got.collect()) == [1, 2]
    # element absent from every list -> empty, not an error
    assert query_with_unfolding_index(t, idx, ["k"], "z").count() == 0


def test_unique_index_violation(spark):
    import pytest as _pytest

    from ytsaurus_spark.operators.secondary_index import (
        UniqueKeyViolationError,
        build_unique_index,
    )

    ok = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, email string"
    )
    idx = build_unique_index(ok, ["email"], ["k"])
    assert idx.count() == 3

    dup = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "z")], "k long, email string"
    )
    with _pytest.raises(UniqueKeyViolationError, match="email"):
        build_unique_index(dup, ["email"], ["k"])


def test_log_table_retention_trim(spark, tmp_path):
    import time as _time

    import pytest as _pytest

    from ytsaurus_spark.sources.tx_table import LogTxTable

    t = LogTxTable(spark, str(tmp_path / "ret"), key_cols=["k"])
    t.init(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))       # v0
    t.insert_rows(spark.createDataFrame([(1, 11)], "k long, v long"))         # v1
    t.insert_rows(spark.createDataFrame([(3, 30)], "k long, v long"))         # v2
    cut = _time.time()
    _time.sleep(0.01)
    t.insert_rows(spark.createDataFrame([(2, 21)], "k long, v long"))         # v3
    base_v = t.compact()                                                       # v4

    # before trim: full history readable
    assert {r["v"] for r in t.read(version=1).collect()} == {11, 20}

    reclaimed = t.trim_history(cut)
    assert reclaimed == 3  # v0, v1, v2 retired; v3 (post-cut) + base kept

    # current state intact, including the post-cut delta
    now = {r["k"]: r["v"] for r in t.read().collect()}
    assert now == {1: 11, 2: 21, 3: 30}
    # segments on disk actually reclaimed
    import os as _os
    assert not _os.path.exists(str(tmp_path / "ret" / "s0"))

    # reads below the retention floor are rejected
    with _pytest.raises(ValueError, match="retention"):
        t.read(version=1)
    # reads at/after the floor still fine
    assert t.read(version=base_v).count() == 3

    # history now spans only retained deltas
    hist = t.versioned_lookup(spark.createDataFrame([(2,)], "k long"))
    assert [r["__gen"] for r in hist.collect()] == [3]

    # new commits continue normally after a trim
    t.insert_rows(spark.createDataFrame([(4, 40)], "k long, v long"))
    assert t.read().count() == 4


def test_changes_between_replay_and_compaction_fallback(spark, tmp_path):
    from ytsaurus_spark.sources.tx_table import LogTxTable

    t = LogTxTable(spark, str(tmp_path / "cdc"), key_cols=["k"])
    v0 = t.init(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    ))
    # commit A: real update for k=1, NO-OP rewrite for k=2, insert k=4
    t.insert_rows(spark.createDataFrame(
        [(1, 11), (2, 20), (4, 40)], "k long, v long"
    ))
    # commit B: delete k=3
    v2 = t.delete_rows(spark.createDataFrame([(3,)], "k long"))

    got = {
        r["k"]: (r["change"], r["old_v"], r["new_v"])
        for r in t.changes_between(from_version=v0).collect()
    }
    assert got == {
        1: ("update", 10, 11),
        3: ("delete", 30, None),
        4: ("insert", None, 40),
    }  # k=2 rewrote its own value: net diff drops it

    # an intermediate range that contains only commit A
    got_a = {r["k"]: r["change"]
             for r in t.changes_between(from_version=v0,
                                        to_version=v2 - 1).collect()}
    assert got_a == {1: "update", 4: "insert"}

    # compaction inside the range forces the state-diff fallback; the
    # same net answer must come back, including the delete
    t.compact()
    t.insert_rows(spark.createDataFrame([(5, 50)], "k long, v long"))
    got_fb = {
        r["k"]: (r["change"], r["old_v"], r["new_v"])
        for r in t.changes_between(from_version=v0).collect()
    }
    assert got_fb == {
        1: ("update", 10, 11),
        3: ("delete", 30, None),
        4: ("insert", None, 40),
        5: ("insert", None, 50),
    }


def test_apply_changes_syncs_replica(spark, tmp_path):
    from ytsaurus_spark.sources.tx_table import LogTxTable

    src = LogTxTable(spark, str(tmp_path / "src"), key_cols=["k"])
    seed = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    v0 = src.init(seed)

    rep = LogTxTable(spark, str(tmp_path / "rep"), key_cols=["k"])
    rep.init(seed)  # replica synced at v0

    src.insert_rows(spark.createDataFrame([(1, 11), (4, 40)], "k long, v long"))
    src.delete_rows(spark.createDataFrame([(2,)], "k long"))

    rep.apply_changes(src.changes_between(from_version=v0))
    assert sorted(map(tuple, rep.read().collect())) == sorted(
        map(tuple, src.read().collect())
    )

    # empty diff applies as a no-op (no spurious commits)
    before = rep.current_version()
    assert rep.apply_changes(src.changes_between(from_version=src.current_version())) is None
    assert rep.current_version() == before


def test_changes_between_and_apply_with_aggregate_folds(spark, tmp_path):
    # Review-found bug class: fold columns must diff and apply by their
    # RESOLVED values, not raw deltas (a plain upsert would re-fold).
    from ytsaurus_spark.sources.tx_table import LogTxTable

    src = LogTxTable(spark, str(tmp_path / "asrc"), key_cols=["k"],
                     aggregates={"cnt": "sum"})
    v0 = src.init(spark.createDataFrame([(1, 10), (2, 5)], "k long, cnt long"))
    src.insert_rows(spark.createDataFrame([(1, 1)], "k long, cnt long"))
    src.insert_rows(spark.createDataFrame([(1, 2)], "k long, cnt long"))
    assert {r["k"]: r["cnt"] for r in src.read().collect()} == {1: 13, 2: 5}

    diff = src.changes_between(from_version=v0)
    got = {r["k"]: (r["change"], r["old_cnt"], r["new_cnt"])
           for r in diff.collect()}
    assert got == {1: ("update", 10, 13)}  # resolved image, not the +2 delta

    rep = LogTxTable(spark, str(tmp_path / "arep"), key_cols=["k"],
                     aggregates={"cnt": "sum"})
    rep.init(spark.createDataFrame([(1, 10), (2, 5)], "k long, cnt long"))
    rep.apply_changes(diff)
    assert {r["k"]: r["cnt"] for r in rep.read().collect()} == {1: 13, 2: 5}
    # idempotent: re-applying the same diff converges, never re-folds
    rep.apply_changes(diff)
    assert {r["k"]: r["cnt"] for r in rep.read().collect()} == {1: 13, 2: 5}


def test_changes_between_randomized_model(spark, tmp_path):
    # Property: for ANY committed version pair (v_i, v_j), applying
    # changes_between(v_i, v_j) to a fresh table seeded with the state at
    # v_i reproduces the state at v_j exactly — across random upserts,
    # deletes, fold columns, and a mid-sequence compaction. Seeded, so
    # failures reproduce.
    import random

    from ytsaurus_spark.sources.tx_table import LogTxTable

    rng = random.Random(7)
    src = LogTxTable(spark, str(tmp_path / "rsrc"), key_cols=["k"],
                     aggregates={"cnt": "sum"})
    versions = [src.init(spark.createDataFrame(
        [(k, rng.randint(0, 5), rng.randint(0, 9)) for k in range(8)],
        "k long, v long, cnt long",
    ))]
    for step in range(6):
        if step == 3:
            src.compact()
        if rng.random() < 0.3:
            keys = rng.sample(range(12), 2)
            versions.append(src.delete_rows(
                spark.createDataFrame([(k,) for k in keys], "k long")
            ))
        else:
            rows = [
                (rng.randrange(12), rng.randint(0, 5), rng.randint(0, 9))
                for _ in range(3)
            ]
            versions.append(src.insert_rows(
                spark.createDataFrame(rows, "k long, v long, cnt long")
            ))

    def state(v):
        return sorted(map(tuple, src.read(version=v).collect()))

    pairs = [(versions[0], versions[-1]), (versions[2], versions[4]),
             (versions[1], versions[-1]), (versions[4], versions[4])]
    for i, (v1, v2) in enumerate(pairs):
        rep = LogTxTable(spark, str(tmp_path / f"rrep{i}"), key_cols=["k"],
                         aggregates={"cnt": "sum"})
        rep.init(src.read(version=v1))
        rep.apply_changes(src.changes_between(from_version=v1, to_version=v2))
        assert sorted(map(tuple, rep.read().collect())) == state(v2), (v1, v2)


def test_indexed_keyed_table_write_through(spark):
    """IndexedKeyedTable: every mutation advances base + indexes together;
    unique violations abort BEFORE commit (transform.cpp write path)."""
    import pytest

    from ytsaurus_spark.operators.keyed_tables import KeyedTable
    from ytsaurus_spark.operators.secondary_index import (
        IndexedKeyedTable,
        UniqueKeyViolationError,
    )

    base = spark.createDataFrame(
        [(1, "a@x", ["p", "q"]), (2, "b@x", ["q"])],
        "k bigint, email string, tags array<string>",
    )
    t = IndexedKeyedTable(
        KeyedTable(df=base, key_cols=["k"]),
        indexes={
            "by_email": {"kind": "unique", "columns": ["email"]},
            "by_tag": {"kind": "unfolding", "column": "tags"},
        },
    )
    # index-backed lookups
    assert [r.k for r in t.lookup_via_index("by_email", F.col("email") == "b@x").collect()] == [2]
    got = {r.k for r in t.lookup_via_index("by_tag", F.col("__unfolded") == "q").collect()}
    assert got == {1, 2}

    # upsert maintains: key 1 changes email and tags; key 3 appends
    t2 = t.insert_rows(
        spark.createDataFrame(
            [(1, "a2@x", ["r"]), (3, "c@x", ["p"])],
            "k bigint, email string, tags array<string>",
        )
    )
    assert {r.email for r in t2.index("by_email").collect()} == {"a2@x", "b@x", "c@x"}
    assert {r.k for r in t2.lookup_via_index("by_tag", F.col("__unfolded") == "p").collect()} == {3}
    assert t2.lookup_via_index("by_email", F.col("email") == "a@x").count() == 0

    # unique violation: key 3 trying to take key 2's email aborts; state intact
    with pytest.raises(UniqueKeyViolationError):
        t2.insert_rows(
            spark.createDataFrame(
                [(3, "b@x", ["z"])], "k bigint, email string, tags array<string>"
            )
        )
    # same-key re-write of its own unique value is fine (no other-key clash)
    t3 = t2.insert_rows(
        spark.createDataFrame(
            [(2, "b@x", ["q", "s"])], "k bigint, email string, tags array<string>"
        )
    )
    assert {r.k for r in t3.lookup_via_index("by_tag", F.col("__unfolded") == "s").collect()} == {2}

    # delete maintains every index
    t4 = t3.delete_rows(spark.createDataFrame([(1,)], "k bigint"))
    assert t4.index("by_email").count() == 2
    assert t4.lookup_via_index("by_tag", F.col("__unfolded") == "r").count() == 0


def test_select_rows_row_limits_and_full_scan_guard(spark):
    """TSelectRowsOptions parity: input/output row limits raise, the
    full-scan guard refuses WHERE-less text when disallowed."""
    import pytest

    from ytsaurus_spark.operators.select_rows import (
        FullScanError,
        QueryRowLimitError,
        select_rows,
    )

    spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "k bigint, g bigint"
    ).createOrReplaceTempView("lim_t")

    ok = select_rows(spark, "k FROM [//t/lim_t] WHERE g = 0",
                     output_row_limit=50, input_row_limit=100)
    assert ok.count() == 34
    with pytest.raises(QueryRowLimitError):
        select_rows(spark, "k FROM [//t/lim_t] WHERE g = 0", output_row_limit=10)
    with pytest.raises(QueryRowLimitError):
        select_rows(spark, "k FROM [//t/lim_t] WHERE g = 0", input_row_limit=99)
    with pytest.raises(FullScanError):
        select_rows(spark, "k FROM [//t/lim_t]", allow_full_scan=False)
    # a predicate makes it legal again
    assert select_rows(
        spark, "k FROM [//t/lim_t] WHERE k < 5", allow_full_scan=False
    ).count() == 5
