"""xdelta aggregate-column states: delta codec, MergeStates decision
table, and the KeyedTable/LogTxTable "xdelta" fold (reference:
library/cpp/xdelta3/state/merge.cpp, state_header.proto)."""

from __future__ import annotations

import random

from ytsaurus_spark.functions import xdelta as X


def test_delta_roundtrip_randomized():
    rnd = random.Random(11)
    for _ in range(150):
        base = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 300)))
        t = bytearray(base)
        for _ in range(rnd.randrange(0, 5)):
            p = rnd.randrange(len(t) + 1)
            op = rnd.randrange(3)
            if op == 0:
                t[p:p] = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 25)))
            elif op == 1:
                del t[p : p + rnd.randrange(1, 15)]
            else:
                t[p:p] = bytes([rnd.randrange(256)]) * rnd.randrange(1, 40)
        target = bytes(t)
        d = X.delta_encode(base, target)
        assert X.delta_apply(base, d) == target


def test_delta_compose_equals_sequential_apply():
    rnd = random.Random(23)
    for _ in range(60):
        a = bytes(rnd.randrange(256) for _ in range(rnd.randrange(10, 200)))
        b = a[: len(a) // 2] + bytes(rnd.randrange(256) for _ in range(20)) + a[len(a) // 2 :]
        c = b[::-1] + a[:7]
        d1 = X.delta_encode(a, b)
        d2 = X.delta_encode(b, c)
        assert X.delta_apply(a, X.delta_compose(d1, d2)) == c


def test_patch_is_small_for_local_edit():
    base = bytes(range(256)) * 400  # 100 KB
    target = base[:50_000] + b"EDIT" + base[50_000:]
    p = X.make_patch(base, target)
    assert len(p) < 200  # O(edit), not O(value)
    s = X.merge_states(X.make_base(base), p)
    assert X.decode_base(s) == target


def test_merge_decision_table():
    base = b"hello world " * 30
    v1 = base + b"|r1"
    v2 = v1.replace(b"world", b"spark")
    s0, p1, p2 = X.make_base(base), X.make_patch(base, v1), X.make_patch(v1, v2)

    # BASE + PATCH applies with hash verification
    assert X.decode_base(X.merge_states(s0, p1)) == v1
    # PATCH + PATCH composes without the base; header chains hashes
    pp = X.merge_states(p1, p2)
    h = X.state_header(pp)
    assert h["type"] == X.PATCH
    assert h["base_hash"] == X.murmur32(base)
    assert h["state_hash"] == X.murmur32(v2)
    assert X.decode_base(X.merge_states(s0, pp)) == v2
    # rhs BASE overwrites unconditionally (merge.cpp:210)
    assert X.decode_base(X.merge_states(pp, X.make_base(b"new"))) == b"new"
    # fold in write order
    assert X.decode_base(X.fold_states([s0, p1, p2])) == v2


def test_merge_error_codes_propagate():
    base = b"0123456789" * 20
    v1 = base + b"x"
    p1 = X.make_patch(base, v1)
    # wrong base -> BASE_HASH_ERROR; errors fold through unchanged
    bad = X.merge_states(X.make_base(b"other"), p1)
    assert X.state_error(bad) == X.BASE_HASH_ERROR
    assert X.state_error(X.merge_states(bad, p1)) == X.BASE_HASH_ERROR
    # mismatched patch chain -> MERGE_PATCHES_ERROR
    p2 = X.make_patch(v1 + b"y", v1 + b"yz")
    assert X.state_error(X.merge_states(p1, p2)) == X.MERGE_PATCHES_ERROR
    # unparseable stored state -> HEADER_PARSE_ERROR
    assert X.state_error(X.merge_states(b"", p1)) == X.HEADER_PARSE_ERROR
    # patch-first is legal; base-after-patch overwrite is legal; but a
    # stored NONE_TYPE state is YT_MERGE_ERROR
    none_state = X._encode_state({"type": X.NONE_TYPE, "data_size": 0})
    assert X.state_error(X.merge_states(none_state, p1)) == X.MISSING_REQUIRED_FIELD_ERROR
    # declared size disagreeing with payload -> WRONG_DATA_SIZE
    lying = X._encode_state({"type": X.BASE, "data_size": 5}, b"12")
    assert X.state_error(X.merge_states(lying, p1)) == X.WRONG_DATA_SIZE


def test_empty_patch_semantics():
    v = b"stable value " * 10
    pe = X.make_patch(v, v)
    assert X.state_payload(pe) == b""
    # BASE + empty patch -> BASE unchanged (after size+hash re-verify)
    assert X.decode_base(X.merge_states(X.make_base(v), pe)) == v
    # PATCH + empty -> PATCH unchanged; empty + PATCH -> PATCH
    p = X.make_patch(b"prior " * 20, v)
    assert X.merge_states(p, pe) == p
    # bad empty patch (hashes disagree) -> MERGE_PATCHES_ERROR
    bad_empty = X._encode_state(
        {"type": X.PATCH, "base_hash": 1, "state_hash": 2, "state_size": len(v),
         "data_size": 0}
    )
    assert X.state_error(X.merge_states(p, bad_empty)) == X.MERGE_PATCHES_ERROR


def test_header_is_proto2_wire_format():
    """Framing matches state.cpp EncodeHeaderTo: varint(len) then proto2
    varint fields tagged 1..6 — decodable by any proto2 reader."""
    s = X.make_base(b"abc")
    hlen = s[0]
    body = s[1 : 1 + hlen]
    # field 1 (type): key 0x08, value BASE=1; field 5 (data_size): 0x28, 3
    assert body[0] == 0x08 and body[1] == X.BASE
    assert bytes([0x28, 3]) in body
    assert s[1 + hlen :] == b"abc"


def test_keyed_table_xdelta_fold(spark):
    """aggregates={'col': 'xdelta'}: binary states fold per key inside
    the upsert groupBy, patches in generation order."""
    from ytsaurus_spark.operators.keyed_tables import KeyedTable

    base_vals = {1: b"doc one " * 50, 2: b"doc two " * 50}
    v1 = {k: v + b"|rev1" for k, v in base_vals.items()}
    v2 = {k: v.replace(b"doc", b"DOC") for k, v in v1.items()}

    df0 = spark.createDataFrame(
        [(k, X.make_base(v)) for k, v in base_vals.items()], "k bigint, st binary"
    )
    t = KeyedTable(df=df0, key_cols=["k"], aggregates={"st": "xdelta"})
    t = t.insert_rows(
        spark.createDataFrame(
            [(k, X.make_patch(base_vals[k], v1[k])) for k in base_vals],
            "k bigint, st binary",
        )
    )
    t = t.insert_rows(
        spark.createDataFrame(
            [(1, X.make_patch(v1[1], v2[1])), (2, None)], "k bigint, st binary"
        )
    )
    got = {r.k: bytes(r.st) for r in t.df.collect()}
    assert X.decode_base(got[1]) == v2[1]
    assert X.decode_base(got[2]) == v1[2]  # null delta = identity

    # a patch against the wrong base surfaces as a stored error state
    t_bad = t.insert_rows(
        spark.createDataFrame(
            [(2, X.make_patch(b"wrong base", b"whatever"))], "k bigint, st binary"
        )
    )
    bad = {r.k: bytes(r.st) for r in t_bad.df.collect()}
    assert X.state_error(bad[2]) == X.BASE_HASH_ERROR


def test_log_tx_table_xdelta_fold(spark, tmp_path):
    """Durable layer: xdelta states fold across delta segments."""
    from ytsaurus_spark.sources.tx_table import LogTxTable

    base = b"persistent " * 40
    v1, v2 = base + b"|a", base + b"|a|b"
    lt = LogTxTable(
        spark, str(tmp_path / "xd"), key_cols=["k"], aggregates={"st": "xdelta"}
    )
    lt.init(spark.createDataFrame([(1, X.make_base(base))], "k bigint, st binary"))
    lt.insert_rows(
        spark.createDataFrame([(1, X.make_patch(base, v1))], "k bigint, st binary")
    )
    lt.insert_rows(
        spark.createDataFrame([(1, X.make_patch(v1, v2))], "k bigint, st binary")
    )
    (row,) = lt.read().collect()
    assert X.decode_base(bytes(row.st)) == v2
