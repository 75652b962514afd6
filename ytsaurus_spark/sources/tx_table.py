"""Durable transactional keyed table: versioned parquet snapshots with an
atomic commit log — the on-disk backing for dynamic tables.

Reference semantics being reproduced: dynamic tables are ACID key-value
stores with timestamped reads (SURVEY §1.5); our in-memory ``KeyedTable``
gives the algebra (upsert/fold/delete), this module gives the durability:

- each commit writes a full snapshot ``v{N}/`` + appends a manifest line;
- the manifest (``_log.json``) is replaced atomically via os.replace, so a
  reader always sees a complete committed version (no torn reads);
- ``read(version=...)`` = time travel (Delta ``VERSION AS OF`` analog —
  with Delta jars on the classpath this module collapses to MERGE INTO +
  time travel; the public API is shaped for that swap).

Scale note: full-snapshot commits are O(table); a log-structured variant
(delta files + compaction, i.e. the reference's LSM or Delta's actual
design) drops this to O(changes). The commit/manifest protocol here is the
part that carries over unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ytsaurus_spark.operators.keyed_tables import KeyedTable


class TxTable:
    """Versioned keyed table rooted at a directory."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        aggregates: dict[str, str] | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.aggregates = aggregates or {}
        os.makedirs(path, exist_ok=True)

    # -- commit log ---------------------------------------------------------

    @property
    def _log_path(self) -> str:
        return os.path.join(self.path, "_log.json")

    def _versions(self) -> list[int]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)["versions"]

    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else -1

    def _commit(self, df: DataFrame) -> int:
        new_v = self.current_version() + 1
        snap_dir = os.path.join(self.path, f"v{new_v}")
        df.write.mode("overwrite").parquet(snap_dir)
        manifest = {"versions": self._versions() + [new_v]}
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._log_path)  # atomic publish
        return new_v

    # -- reads --------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no committed version in {self.path}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in committed set {vs}")
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def lookup_rows(self, keys: DataFrame) -> DataFrame:
        return self._keyed().lookup_rows(keys)

    # -- writes -------------------------------------------------------------

    def init(self, df: DataFrame) -> int:
        """First commit (empty or seeded)."""
        return self._commit(df)

    def insert_rows(self, rows: DataFrame) -> int:
        """Upsert with aggregate-column folding, durably committed."""
        return self._commit(self._keyed().insert_rows(rows).df)

    def delete_rows(self, keys: DataFrame) -> int:
        return self._commit(self._keyed().delete_rows(keys).df)

    def _keyed(self) -> KeyedTable:
        return KeyedTable(
            df=self.read(), key_cols=self.key_cols, aggregates=self.aggregates
        )
