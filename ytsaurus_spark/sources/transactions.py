"""Cross-table atomic transactions over LogTxTable — the reference's
tablet transactions span tables through a transaction supervisor running
two-phase commit across participant tablet cells
(yt/yt/server/lib/transaction_supervisor/; client surface
`start_transaction` / tablet tx in yt/yt/client/api/transaction.h).

Spark-side shape — write-ahead intent + presumed roll-forward:

1. **Prepare**: every staged write lands as an UNPUBLISHED segment
   (`LogTxTable._stage_segment` — readers are manifest-driven, so staged
   parquet stays invisible).
2. **Intent**: one JSON record listing every (table path, manifest entry)
   is written atomically (os.replace). THIS is the commit point: before
   it, a crash leaves only invisible orphan files; after it, the
   transaction is durably decided.
3. **Publish**: each participant's manifest gains its entry (idempotent —
   an entry already present is skipped, so re-running after a crash is
   safe). 4. The intent is removed.

`recover(coordinator_dir)` rolls every decided-but-unfinished intent
FORWARD (pure JSON manipulation — no Spark needed), which is the
presumed-commit half of 2PC; `abort()` before commit discards staged
segment dirs. Single writer per table is assumed (the reference's
tablet write path serializes through the tablet cell leader the same
way); `_publish_entry` still verifies the staged version is the next
version and raises on a conflicting interleaved commit rather than
corrupting the log.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame

from ytsaurus_spark.sources.tx_table import LogTxTable


def _read_manifest(table_path: str) -> list[dict]:
    p = os.path.join(table_path, "_log.json")
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["segments"]


def _publish_entry(table_path: str, entry: dict) -> None:
    """Append one manifest entry, atomically and idempotently (an entry
    with the same version already present means a prior attempt already
    published here — skip). Raises if a DIFFERENT commit took the staged
    version: that is a concurrent-writer conflict the caller must see."""
    segs = _read_manifest(table_path)
    existing = [s for s in segs if s["v"] == entry["v"]]
    if existing:
        if existing[0]["kind"] != entry["kind"]:
            raise RuntimeError(
                f"version {entry['v']} of {table_path} was taken by a "
                "conflicting commit"
            )
        return
    if segs and entry["v"] != segs[-1]["v"] + 1:
        raise RuntimeError(
            f"staged version {entry['v']} is stale for {table_path} "
            f"(log is at {segs[-1]['v']}): concurrent writer"
        )
    manifest = {"segments": segs + [entry]}
    fd, tmp = tempfile.mkstemp(dir=table_path, suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(table_path, "_log.json"))


class MultiTableTransaction:
    """Stage writes against several LogTxTables, commit atomically.

    Usage::

        tx = MultiTableTransaction(coord_dir)
        tx.insert_rows(accounts, debit_rows)
        tx.insert_rows(ledger, entry_rows)
        tx.delete_rows(holds, released_keys)
        tx.commit()          # all-or-nothing across the three tables

    Writes stay invisible in EVERY table until commit; after the intent
    record is durable, `recover()` finishes publication even across a
    crash, so no reader can ever observe one table updated without the
    others (beyond the instant between the individual manifest swaps —
    the same read-skew window the reference closes with timestamps,
    closed here the same way: `read(timestamp=...)` below the commit's
    ts is consistent by construction since old segments are immutable).
    """

    def __init__(self, coordinator_dir: str) -> None:
        self.dir = coordinator_dir
        os.makedirs(coordinator_dir, exist_ok=True)
        self.tx_id = uuid.uuid4().hex[:16]
        self._ops: list[tuple[LogTxTable, str, DataFrame, dict]] = []
        self._state = "open"

    # -- staging ----------------------------------------------------------

    def insert_rows(
        self,
        table: LogTxTable,
        rows: DataFrame,
        update: bool = False,
        seq_col: str | None = None,
    ) -> None:
        self._check_open()
        self._ops.append(
            (table, "insert", rows, {"update": update, "seq_col": seq_col})
        )

    def delete_rows(self, table: LogTxTable, keys: DataFrame) -> None:
        self._check_open()
        self._ops.append((table, "delete", keys, {}))

    def _check_open(self) -> None:
        if self._state != "open":
            raise RuntimeError(f"transaction is {self._state}")

    # -- 2PC --------------------------------------------------------------

    @property
    def _intent_path(self) -> str:
        return os.path.join(self.dir, f"tx_{self.tx_id}.json")

    def commit(self) -> None:
        """Prepare → intent → publish → forget. The os.replace of the
        intent record is the atomic commit point."""
        self._check_open()
        if not self._ops:
            self._state = "committed"
            return
        # phase 1: stage every segment (one staged version per table —
        # multiple ops on one table stack deltas v, v+1, ... which is
        # fine because they publish in staging order)
        staged: list[dict] = []
        next_v: dict[str, int] = {}
        for table, kind, df, kw in self._ops:
            delta = (
                table._insert_delta(df, **kw)
                if kind == "insert"
                else table._delete_delta(df)
            )
            v = next_v.get(table.path, table.current_version() + 1)
            seg_dir = os.path.join(table.path, f"s{v}")
            delta.write.mode("overwrite").parquet(seg_dir)
            entry = {
                "v": v,
                "kind": "delta",
                "ts": time.time(),
                "range": table._footer_key_range(seg_dir),
            }
            staged.append({"table_path": table.path, "entry": entry})
            next_v[table.path] = v + 1
        # phase 2: durable intent = the commit decision
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"tx_id": self.tx_id, "participants": staged}, f)
        os.replace(tmp, self._intent_path)
        # phase 3: publish everywhere (idempotent), then forget
        for p in staged:
            _publish_entry(p["table_path"], p["entry"])
        os.remove(self._intent_path)
        self._state = "committed"

    def abort(self) -> None:
        """Discard staged state. Only valid before commit(); staged
        segment dirs (if any partial prepare happened) are orphans that
        no manifest references — removed here, harmless if left."""
        self._check_open()
        self._state = "aborted"
        self._ops.clear()


def recover(coordinator_dir: str) -> int:
    """Roll forward every decided-but-unpublished transaction (presumed
    commit). Pure filesystem/JSON work — callable before any Spark
    session exists, exactly like the reference's supervisor replaying
    its commit log on cell restart. Returns the number of transactions
    completed."""
    if not os.path.isdir(coordinator_dir):
        return 0
    n = 0
    for name in sorted(os.listdir(coordinator_dir)):
        if not (name.startswith("tx_") and name.endswith(".json")):
            continue
        path = os.path.join(coordinator_dir, name)
        with open(path) as f:
            intent = json.load(f)
        for p in intent["participants"]:
            _publish_entry(p["table_path"], p["entry"])
        os.remove(path)
        n += 1
    return n
