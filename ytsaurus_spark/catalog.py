"""Catalog: a Cypress-style path→table registry over parquet directories.

The reference stores tables as nodes in the Cypress tree addressed by paths
like ``//home/x/t`` with "rich YPath" read modifiers — column selection and
row/key ranges (parsed in yt/python/yt/wrapper/ypath.py:268-283 of the
reference). Here a table is a parquet file/dir; rich-path modifiers become
declarative ``select``/``filter`` calls so Catalyst turns them into parquet
projection + predicate pushdown (the same chunk-skipping effect the reference
gets from key-range inference, yt/yt/library/query/engine/new_range_inferrer.cpp).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Key (sort) columns per table — the analog of YT's sorted-table key prefix.
# Used by sorted-merge reads and key-guarantee reduce (operators/map_reduce).
DEFAULT_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


@dataclass
class RichPath:
    """Parsed rich path, mirroring the reference's ypath read modifiers
    (yt/python/yt/wrapper/ypath.py:268-283; ypath parsing in
    yt/yt/core/ypath tokenizer):

    - ``path{col1,col2}``       — column selection
    - ``path[#10:#20]``         — row-index range (``#`` prefix)
    - ``path[10:500]``          — KEY range on the primary key:
                                   inclusive lower, exclusive upper
    - ``path[(1,"def"):(2)]``   — composite (tuple) key bounds with YT's
                                   prefix semantics
    - ``path[#24]`` / ``path[(0,"def")]`` — EXACT row / key-prefix
    - ``path[a:b, c:d]``        — multiple ranges (row union)
    """

    path: str
    columns: list[str] | None = None
    # each range: {"lo_row","hi_row","lo_key","hi_key","exact_key"} —
    # key bounds are tuples (scalars wrap to 1-tuples)
    ranges: list[dict] = None  # type: ignore[assignment]
    # legacy single-range views (first range), kept for simple callers
    lower_row: int | None = None
    upper_row: int | None = None
    lower_key: object | None = None
    upper_key: object | None = None

    _RE = re.compile(
        r"^(?P<path>[^{\[]+)"
        r"(?:\{(?P<cols>[^}]*)\})?"
        r"(?:\[(?P<ranges>.*)\])?$"
    )

    @staticmethod
    def _scalar(s: str):
        s = s.strip()
        if not s:
            return None
        if s.startswith(("'", '"')) and s.endswith(s[0]) and len(s) >= 2:
            return s[1:-1]
        try:
            return int(s)
        except ValueError:
            return float(s)

    @classmethod
    def _key_bound(cls, s: str):
        """A key bound: scalar, or ``(a, b, ...)`` tuple; ``()`` / empty
        -> None (unbounded). Returns a tuple or None."""
        s = s.strip()
        if not s:
            return None
        if s.startswith("(") and s.endswith(")"):
            inner = s[1:-1].strip()
            if not inner:
                return None
            parts = cls._split_range_commas(inner)
            return tuple(cls._scalar(p) for p in parts)
        v = cls._scalar(s)
        return None if v is None else (v,)

    @staticmethod
    def _split_range_commas(s: str) -> list[str]:
        parts, buf, depth = [], [], 0
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c in ("'", '"'):
                j = i + 1
                while j < n and s[j] != c:
                    j += 1
                buf.append(s[i : j + 1])
                i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if c == "," and depth == 0:
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(c)
            i += 1
        parts.append("".join(buf))
        return parts

    @staticmethod
    def _split_colon(s: str) -> list[str]:
        """Split a range on its top-level ``:`` (colons inside quotes or
        parens don't count)."""
        depth, i, n = 0, 0, len(s)
        while i < n:
            c = s[i]
            if c in ("'", '"'):
                j = i + 1
                while j < n and s[j] != c:
                    j += 1
                i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == ":" and depth == 0:
                return [s[:i], s[i + 1:]]
            i += 1
        return [s]

    @classmethod
    def parse(cls, rich: str) -> "RichPath":
        m = cls._RE.match(rich.strip())
        if not m:
            raise ValueError(f"bad rich path: {rich!r}")
        cols = m.group("cols")
        out = cls(
            path=m.group("path").strip(),
            columns=[c.strip() for c in cols.split(",") if c.strip()] if cols else None,
            ranges=[],
        )
        spec = m.group("ranges")
        if spec is None or not spec.strip():
            if spec is not None:
                # "[]" — empty range list reads nothing? YT treats [] as
                # no ranges -> full read; keep full read
                pass
            return out
        for part in cls._split_range_commas(spec):
            part = part.strip()
            if not part:
                continue
            halves = cls._split_colon(part)
            r = {"lo_row": None, "hi_row": None, "lo_key": None,
                 "hi_key": None, "exact_key": None}
            if len(halves) == 1:
                # EXACT selector
                b = halves[0].strip()
                if b.startswith("#"):
                    r["lo_row"] = int(b[1:])
                    r["hi_row"] = int(b[1:]) + 1
                else:
                    k = cls._key_bound(b)
                    if k is None:
                        raise ValueError(
                            f"empty exact range in rich path: {rich!r}")
                    r["exact_key"] = k
            else:
                lo, hi = (h.strip() for h in halves)
                if lo.startswith("#"):
                    r["lo_row"] = int(lo[1:]) if lo[1:] else None
                elif lo:
                    r["lo_key"] = cls._key_bound(lo)
                if hi.startswith("#"):
                    r["hi_row"] = int(hi[1:]) if hi[1:] else None
                elif hi:
                    r["hi_key"] = cls._key_bound(hi)
            out.ranges.append(r)
        if len(out.ranges) == 1:
            r = out.ranges[0]
            out.lower_row, out.upper_row = r["lo_row"], r["hi_row"]
            lk, hk = r["lo_key"], r["hi_key"]
            out.lower_key = lk[0] if lk and len(lk) == 1 else lk
            out.upper_key = hk[0] if hk and len(hk) == 1 else hk
        return out


def _key_range_cond(key_cols: list[str], r: dict):
    """Spark predicate for one parsed range's KEY bounds (YT semantics:
    inclusive lower, exclusive upper, lexicographic over the key prefix
    the bound names)."""
    conds = []
    if r["exact_key"] is not None:
        k = r["exact_key"]
        c = F.lit(True)
        for col, v in zip(key_cols, k):
            c = c & (F.col(col) == F.lit(v))
        return c
    if r["lo_key"] is not None:
        b = r["lo_key"]
        n = len(b)
        c = F.col(key_cols[n - 1]) >= F.lit(b[n - 1])
        for i in reversed(range(n - 1)):
            c = (F.col(key_cols[i]) > F.lit(b[i])) | (
                (F.col(key_cols[i]) == F.lit(b[i])) & c)
        conds.append(c)
    if r["hi_key"] is not None:
        b = r["hi_key"]
        n = len(b)
        c = F.col(key_cols[n - 1]) < F.lit(b[n - 1])
        for i in reversed(range(n - 1)):
            c = (F.col(key_cols[i]) < F.lit(b[i])) | (
                (F.col(key_cols[i]) == F.lit(b[i])) & c)
        conds.append(c)
    acc = conds[0]
    for c in conds[1:]:
        acc = acc & c
    return acc


def apply_ranges(df: DataFrame, rp: RichPath, key_cols: list[str]) -> DataFrame:
    """Filter ``df`` to the union of ``rp.ranges``. Row-index bounds use
    ONE global-index pass shared by every range; key bounds become
    min/max-prunable scan predicates (the reference's InferRanges,
    executor.cpp:260-300)."""
    if not rp.ranges:
        return df
    need_rows = any(r["lo_row"] is not None or r["hi_row"] is not None
                    for r in rp.ranges)
    if need_rows:
        df = _with_global_row_index(df)
    conds = []
    for r in rp.ranges:
        c = F.lit(True)
        if r["lo_row"] is not None:
            c = c & (F.col("__row_index") >= r["lo_row"])
        if r["hi_row"] is not None:
            c = c & (F.col("__row_index") < r["hi_row"])
        if (r["exact_key"] is not None or r["lo_key"] is not None
                or r["hi_key"] is not None):
            if not key_cols:
                raise ValueError(
                    f"key range on an unsorted table: {rp.path}")
            c = c & _key_range_cond(key_cols, r)
        conds.append(c)
    acc = conds[0]
    for c in conds[1:]:
        acc = acc | c
    df = df.filter(acc)
    return df.drop("__row_index") if need_rows else df


def _with_global_row_index(df: DataFrame, col: str = "__row_index") -> DataFrame:
    """Attach a 0-based global row index in scan order.

    monotonically_increasing_id() encodes (partition_id << 33) + local row
    number, so the local number is the low 33 bits; the global index adds
    the total row count of all preceding partitions — computed by one
    count-only pass and broadcast back (the offsets table has one row per
    partition, never large). Deterministic because both passes plan the
    same scan splits."""
    from pyspark.sql import Window

    pid = F.spark_partition_id()
    mid = F.monotonically_increasing_id()
    base = df.withColumn("__pid", pid).withColumn(col, mid.bitwiseAND((1 << 33) - 1))
    counts = base.groupBy("__pid").count()
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("count").over(w), F.lit(0)).alias("__offset")
    )
    return (
        base.join(F.broadcast(offsets), "__pid")
        .withColumn(col, F.col(col) + F.col("__offset"))
        .drop("__pid", "__offset")
    )


@dataclass
class Catalog:
    """Registers every ``<name>.parquet`` under ``root`` as a temp view.

    ``read`` honors rich-path modifiers; plain reads go straight to the
    vectorized parquet scan so all pruning stays inside Catalyst.
    """

    spark: SparkSession
    root: str
    keys: dict[str, list[str]] = field(default_factory=lambda: dict(DEFAULT_KEYS))
    _nanos_cache: dict[str, list[str]] = field(default_factory=dict, repr=False)
    _df_cache: dict[str, DataFrame] = field(default_factory=dict, repr=False)

    def __post_init__(self) -> None:
        # Self-configure the caller's session: the catalog must be readable
        # from ANY SparkSession, not just ones built by session.get_spark
        # (the driver harness passes its own). Without nanosAsLong the
        # events table's TIMESTAMP(NANOS) column aborts every read.
        from ytsaurus_spark.session import ensure_runtime_confs

        ensure_runtime_confs(self.spark)

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def read(self, name_or_rich: str) -> DataFrame:
        # Plain-name reads return a memoized (immutable, lazy) DataFrame:
        # re-resolving the same parquet relation is a driver round trip per
        # call with no effect on the plan. Rich paths go through the full
        # parse each time (modifier combinations are open-ended).
        plain = self._df_cache.get(name_or_rich)
        if plain is not None:
            return plain
        rp = RichPath.parse(name_or_rich)
        df = self.spark.read.parquet(self.table_path(rp.path))
        df = self._fix_nanos(rp.path, df)
        # Row-index addressing on a static table uses a TRUE global index
        # (one count-only pre-pass, broadcast offsets — see
        # _with_global_row_index); key ranges push to the parquet scan as
        # min/max-prunable predicates — the reference's key-range read
        # (InferRanges, executor.cpp:260-300) via Catalyst pushdown.
        df = apply_ranges(
            df, rp, self.key_columns(rp.path) or [df.columns[0]])
        if rp.columns:
            df = df.select(*rp.columns)
        if re.fullmatch(r"[A-Za-z_]\w*", name_or_rich):
            self._df_cache[name_or_rich] = df
        return df

    def register_all(self, names: tuple[str, ...] = TABLE_NAMES) -> None:
        for name in names:
            p = self.table_path(name)
            if os.path.exists(p):
                self.read(name).createOrReplaceTempView(name)

    def _fix_nanos(self, name: str, df: DataFrame) -> DataFrame:
        """Convert TIMESTAMP(NANOS) columns (read as long nanoseconds under
        spark.sql.legacy.parquet.nanosAsLong) back to TimestampType with
        ns→µs truncation — the same cast DuckDB applies on read."""
        cols = self._nanos_columns(name)
        for c in cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        # Defensive: if inferTimestampNTZ couldn't be applied to this session
        # before the relation was resolved, µs-without-UTC-flag columns come
        # back as TIMESTAMP_NTZ, which forbids epoch arithmetic. Coerce to
        # TimestampType (session zone is UTC, so the wall time is unchanged).
        from pyspark.sql import types as T

        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        return df

    def _nanos_columns(self, name: str) -> list[str]:
        if name not in self._nanos_cache:
            import pyarrow.parquet as pq

            try:
                schema = pq.read_schema(self.table_path(name))
                import pyarrow as pa

                self._nanos_cache[name] = [
                    f.name
                    for f in schema
                    if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
                ]
            except Exception:
                self._nanos_cache[name] = []
        return self._nanos_cache[name]

    def key_columns(self, name: str) -> list[str]:
        return self.keys.get(name, [])

    def row_count(self, name: str) -> int:
        """Exact row count from parquet footers — no data read. The cheap
        answer to 'how big is this table' that index builds (IVF stride,
        LSH band sizing) need without paying a full count() scan."""
        import pyarrow.parquet as pq

        path = self.table_path(name)
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows

    def columnar_statistics(self, name: str, columns: list[str] | None = None) -> dict[str, int]:
        """GetColumnarStatistics (yt/yt/client/api/table_client.h:470):
        per-column data weight in bytes, from parquet footers — no data
        read. The reference uses these to size jobs; Spark's planner reads
        the same footers for its split planning."""
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(self.table_path(name)).metadata
        weights: dict[str, int] = {}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = col.path_in_schema.split(".")[0]
                if columns is None or cname in columns:
                    weights[cname] = weights.get(cname, 0) + col.total_compressed_size
        return weights

    # -- Cypress-style namespace ops (create/remove/list; tables as nodes) --

    def create_table(self, name: str, df: DataFrame, mode: str = "error") -> None:
        """Create (write) a table node under the catalog root — Cypress
        `create table` + commit. ``mode='error'`` refuses to clobber,
        matching the reference's default create semantics."""
        df.write.mode(mode).parquet(self.table_path(name))
        self._df_cache.pop(name, None)  # relation (file listing) changed
        self._nanos_cache.pop(name, None)
        df.sparkSession.read.parquet(self.table_path(name)).createOrReplaceTempView(name)

    def remove_table(self, name: str) -> None:
        import shutil

        p = self.table_path(name)
        if not os.path.exists(p):
            raise FileNotFoundError(f"no such table node: {name}")
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        self._df_cache.pop(name, None)
        self._nanos_cache.pop(name, None)
        try:
            self.spark.catalog.dropTempView(name)
        except Exception:
            pass

    def list_tables(self) -> list[str]:
        out = []
        for entry in sorted(os.listdir(self.root)):
            if entry.endswith(".parquet"):
                out.append(entry[: -len(".parquet")])
        return out

    def exists(self, name: str) -> bool:
        return os.path.exists(self.table_path(name))

    def partition_table(self, name: str, partition_count: int) -> list[DataFrame]:
        """PartitionTables API (table_client.h:474): split a table into
        ~equal-weight partitions for caller-managed parallel reads. Spark
        plans its own splits; this exposes the same capability for external
        consumers via modular row slicing on the key column."""
        df = self.read(name)
        key = (self.key_columns(name) or [df.columns[0]])[0]
        return [
            df.filter(F.pmod(F.xxhash64(F.col(key)), partition_count) == i)
            for i in range(partition_count)
        ]


def load_tables(spark: SparkSession, sf_dir: str) -> Catalog:
    """Convenience: catalog over one scale-factor dir with views registered.

    Memoized per session object: a long-lived session (the bench harness,
    the driver, a user REPL) calls this before EVERY query, and
    re-registering ten parquet views is pure driver-side overhead
    (schema resolution + catalog round trips per table). The cached
    Catalog is reused while (session, sf_dir) are unchanged — the exact
    contract of a metastore. Any code path that replaces arbitrary-named
    temp views (YQL/CHYT/client table registration) calls
    :func:`invalidate_table_cache` so the next load re-registers the
    base views.
    """
    root = os.path.abspath(sf_dir)
    cached = getattr(spark, "_ytsaurus_catalog_cache", None)
    if cached is not None and cached[0] == root:
        return cached[1]
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    spark._ytsaurus_catalog_cache = (root, cat)
    return cat


def invalidate_table_cache(spark: SparkSession) -> None:
    """Drop the memoized Catalog for ``spark`` — called by every code path
    that registers temp views under caller-controlled names (which may
    shadow a base table view), so the next ``load_tables`` restores them."""
    if getattr(spark, "_ytsaurus_catalog_cache", None) is not None:
        spark._ytsaurus_catalog_cache = None


def _schema_to_json(schema) -> dict:
    import dataclasses

    return {
        "strict": schema.strict,
        "unique_keys": schema.unique_keys,
        "columns": [
            {k: v for k, v in dataclasses.asdict(c).items() if v not in (None, False)}
            for c in schema.columns
        ],
    }


def _schema_from_json(d: dict):
    from ytsaurus_spark.yt_types import ColumnSchema, TableSchema

    return TableSchema(
        columns=[ColumnSchema(**c) for c in d["columns"]],
        strict=d.get("strict", True),
        unique_keys=d.get("unique_keys", False),
    )


def set_table_schema(cat: Catalog, name: str, schema) -> None:
    """Attach a TableSchema to a stored table (the @schema attribute on a
    Cypress table node). Persisted in the `_yt_attrs.json` sidecar next
    to the data, like the sorted_by attribute."""
    from ytsaurus_spark.sources.formats import _write_attrs, table_attributes

    attrs = table_attributes(cat.table_path(name))
    attrs["schema"] = _schema_to_json(schema)
    _write_attrs(cat.table_path(name), attrs)


def get_table_schema(cat: Catalog, name: str):
    from ytsaurus_spark.sources.formats import table_attributes

    d = table_attributes(cat.table_path(name)).get("schema")
    return None if d is None else _schema_from_json(d)


def alter_table(cat: Catalog, name: str, new_schema) -> str:
    """AlterTable (reference `alter_table` / TAlterTableOptions): change a
    stored table's schema under the evolution rules. Applies
    `check_schema_compatibility` (check_schema_compatibility.cpp):

    - ``incompatible`` → refused (ValueError), schema unchanged;
    - ``requires_validation`` → the data is CHECKED first, distributed:
      required columns must hold no NULLs, and every narrowing-type
      column must round-trip through the new type exactly (one scan, an
      aggregate of violation counts — no driver-side rows);
    - ``fully_compatible`` (or validation passed) → metadata-only commit
      of the new schema, exactly like the reference's alter (data files
      are untouched; readers/writers consult the stored schema).

    Returns the verdict that allowed the alter."""
    from pyspark.sql import functions as F

    from ytsaurus_spark.yt_types import (
        _type_compat,
        check_schema_compatibility,
        yt_type_to_spark,
    )

    old = get_table_schema(cat, name)
    if old is None:
        raise ValueError(f"table {name!r} has no stored schema; set one first")
    verdict = check_schema_compatibility(old, new_schema)
    if verdict == "incompatible":
        raise ValueError(f"alter_table({name!r}): schemas are incompatible")
    if verdict == "requires_validation":
        df = cat.read(name)
        old_types = {c.name: c.type_name for c in old.columns}
        checks = []
        for nc in new_schema.columns:
            if nc.name not in df.columns:
                if nc.required:
                    # a required column the data doesn't carry at all is
                    # the all-NULLs case — every row violates it
                    raise ValueError(
                        f"alter_table({name!r}): validation failed: "
                        f"required column {nc.name!r} absent from data"
                    )
                continue
            oc_type = old_types.get(nc.name)
            if nc.required:
                checks.append(
                    F.sum(F.col(nc.name).isNull().cast("long")).alias(
                        f"null_{nc.name}"
                    )
                )
            if oc_type and _type_compat(oc_type, nc.type_name) == "validate":
                t = yt_type_to_spark(nc.type_name).simpleString()
                roundtrip = F.col(nc.name).cast(t).cast(
                    yt_type_to_spark(oc_type).simpleString()
                )
                checks.append(
                    F.sum(
                        (
                            ~roundtrip.eqNullSafe(F.col(nc.name))
                        ).cast("long")
                    ).alias(f"narrow_{nc.name}")
                )
        if checks:
            row = df.agg(*checks).collect()[0]
            bad = {k: v for k, v in row.asDict().items() if v}
            if bad:
                raise ValueError(
                    f"alter_table({name!r}): validation failed: {bad}"
                )
    set_table_schema(cat, name, new_schema)
    return verdict
