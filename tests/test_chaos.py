"""Chaos replication: replication card, eras, cross-cluster queue/data
replicas, switchover, failover (replication_card.h semantics)."""

from __future__ import annotations

import pytest

from ytsaurus_spark.client import YtClient
from ytsaurus_spark.sources.chaos import (
    ASYNC,
    ChaosError,
    ChaosReplicatedTable,
    DISABLED,
    ENABLED,
    SYNC,
)


@pytest.fixture
def chaos(spark, tmp_path):
    clusters = {
        "primary": YtClient(root=str(tmp_path / "primary"), spark=spark),
        "backup": YtClient(root=str(tmp_path / "backup"), spark=spark),
    }
    t = ChaosReplicatedTable(
        spark, str(tmp_path / "card"), key_cols=["k"], clusters=clusters
    )
    t.create_table_replica("q_pri", "primary", "//queues/t", "queue", mode=SYNC)
    t.create_table_replica("q_bak", "backup", "//queues/t", "queue", mode=ASYNC)
    t.create_table_replica("d_pri", "primary", "//data/t", "data", mode=SYNC)
    t.create_table_replica("d_bak", "backup", "//data/t", "data", mode=ASYNC)
    return t, clusters


def rows(df):
    return {(r.k, r.v) for r in df.collect()}


def test_write_path_and_async_catch_up(chaos, spark):
    t, _ = chaos
    t.init(spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint"))
    t.insert_rows(spark.createDataFrame([(3, 30)], "k bigint, v bigint"))
    # sync data replica sees the commit immediately
    assert rows(t.read("d_pri")) == {(1, 10), (2, 20), (3, 30)}
    # async replicas lag until the replicator ticks
    lag = t.replica_lag()
    assert lag["q_bak"] > 0 and lag["d_bak"] > 0 and lag["d_pri"] == 0
    t.tick()
    assert t.replica_lag() == {"q_pri": 0, "q_bak": 0, "d_pri": 0, "d_bak": 0}
    assert rows(t.read("d_bak")) == {(1, 10), (2, 20), (3, 30)}


def test_era_advances_and_history(chaos, spark):
    t, _ = chaos
    e0 = t.era()
    t.switchover("q_bak")
    card = t.get_replication_card()
    assert card["era"] > e0
    assert card["replicas"]["q_bak"]["mode"] == SYNC
    assert card["replicas"]["q_pri"]["mode"] == ASYNC
    # history records the transitional async_to_sync step then sync
    modes = [h["mode"] for h in card["replicas"]["q_bak"]["history"]]
    assert modes[-2:] == ["async_to_sync", "sync"]


def test_failover_promotes_and_recovers(chaos, spark):
    t, _ = chaos
    t.init(spark.createDataFrame([(1, 10)], "k bigint, v bigint"))
    t.tick()  # replicate everywhere
    t.insert_rows(spark.createDataFrame([(2, 20)], "k bigint, v bigint"))
    # primary dies: its replicas disable; backup queue promotes
    t.fail_cluster("primary")
    card = t.get_replication_card()
    assert card["replicas"]["q_pri"]["state"] == DISABLED
    assert card["replicas"]["d_pri"]["state"] == DISABLED
    assert card["replicas"]["q_bak"]["mode"] == SYNC
    # writes continue in the new era (tail (2,20) was not yet shipped —
    # the async-promotion loss window, honest to chaos semantics)
    t.insert_rows(spark.createDataFrame([(3, 30)], "k bigint, v bigint"))
    t.tick()
    assert rows(t.read()) == {(1, 10), (3, 30)}
    # recovery: primary re-enables as async and catches up from backup
    t.recover_cluster("primary")
    card = t.get_replication_card()
    assert card["replicas"]["q_pri"]["state"] == ENABLED
    assert card["replicas"]["q_pri"]["mode"] == ASYNC
    t.tick()
    assert t.replica_lag()["q_pri"] == 0
    assert rows(t.read("d_pri")) == {(1, 10), (3, 30)}


def test_no_sync_queue_rejects_writes(spark, tmp_path):
    clusters = {"c": YtClient(root=str(tmp_path / "c"), spark=spark)}
    t = ChaosReplicatedTable(
        spark, str(tmp_path / "card2"), key_cols=["k"], clusters=clusters
    )
    t.create_table_replica("d", "c", "//data/t", "data", mode=SYNC)
    with pytest.raises(ChaosError):
        t.init(spark.createDataFrame([(1, 1)], "k bigint, v bigint"))
