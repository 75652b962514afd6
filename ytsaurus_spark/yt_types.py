"""YT logical type system ↔ Spark SQL types (SURVEY §1.3).

Reference enums: ``EValueType`` (yt/yt/client/table_client/row_base.h:11-28),
``ESimpleLogicalValueType`` (row_base.h:41-79), ``ELogicalMetatype``
(yt/yt/client/table_client/logical_type.h:24-44). A ``TTableSchema`` is an
ordered column list + ``strict`` + ``unique_keys``
(yt/yt/client/table_client/schema.h:116-129) with per-column sort order,
computed-column expression, and aggregate function.

The mapping is data-model work only — no execution semantics live here.
Uint64 is the one lossy case: Spark has no unsigned 64-bit integer, so the
caller picks LongType (fast, overflow at 2^63) or DecimalType(20,0) (exact).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import types as T

# simple logical type name -> Spark type
SIMPLE_TYPE_MAP: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),     # widened: unsigned fits next size up
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),     # see uint64 note in module docstring
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "utf8": T.StringType(),
    "json": T.StringType(),
    "uuid": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "interval": T.DayTimeIntervalType(),
    "date32": T.DateType(),
    "datetime64": T.TimestampType(),
    "timestamp64": T.TimestampType(),
    "interval64": T.DayTimeIntervalType(),
    "void": T.NullType(),
    "null": T.NullType(),
    # 'any' = arbitrary YSON; carried as a JSON-encoded string column and
    # accessed via functions.yson getters (get_json_object et al.)
    "any": T.StringType(),
}

UINT64_EXACT = T.DecimalType(20, 0)


@dataclass
class ColumnSchema:
    """Mirror of TColumnSchema (schema.h:116-129): name/type plus the engine
    features — sort order makes it a key column, ``expression`` a computed
    column, ``aggregate`` an aggregate column folded on write."""

    name: str
    type_name: str
    required: bool = False
    sort_order: str | None = None  # "ascending" | "descending" | None
    expression: str | None = None  # Spark SQL expr for computed columns
    aggregate: str | None = None   # sum | min | max | first
    # Physical/concurrency hints (schema.h Lock/Group): ``group`` colocates
    # columns in storage — here it orders columns so parquet column chunks
    # of one group sit adjacent (the Scan-format analog of YT's block
    # groups); ``lock`` names the column's write-lock group — Spark commits
    # are snapshot-atomic per table, so locks are carried as metadata for
    # API parity and surfaced in to_spark() field metadata.
    lock: str | None = None
    group: str | None = None

    def spark_field(self) -> T.StructField:
        meta = {}
        if self.lock:
            meta["yt.lock"] = self.lock
        if self.group:
            meta["yt.group"] = self.group
        return T.StructField(
            self.name,
            yt_type_to_spark(self.type_name),
            nullable=not self.required,
            metadata=meta or None,
        )


@dataclass
class TableSchema:
    """Mirror of TTableSchema: ordered columns + strict + unique_keys.

    ``strict=False`` (weak schema) adds a ``_rest`` JSON overflow column —
    rows may carry fields outside the declared set, as in YT's schemaless
    tables (schema mode Weak, yt/yt/client/table_client/public.h:151-154).
    """

    columns: list[ColumnSchema]
    strict: bool = True
    unique_keys: bool = False
    REST_COLUMN: str = field(default="_rest", repr=False)

    def key_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.sort_order]

    def group_order(self) -> list[str]:
        """Column order with storage groups colocated (TColumnSchema::Group,
        schema.h): grouped columns become adjacent parquet column chunks —
        the Scan-format block-group analog. Key columns stay first;
        ungrouped columns keep declaration order after their group peers."""
        keys = [c for c in self.columns if c.sort_order]
        rest = [c for c in self.columns if not c.sort_order]
        seen: dict[str, list] = {}
        ordered: list = []
        for c in rest:
            g = c.group or f"__solo_{c.name}"
            if g not in seen:
                seen[g] = []
                ordered.append(seen[g])
            seen[g].append(c)
        return [c.name for c in keys] + [c.name for grp in ordered for c in grp]

    def validate_required(self, df):
        """NOT NULL enforcement for ``required`` columns (schema.h Required)
        as a plan-side filter guard: returns (clean_df, violations_df) so
        writers can reject or quarantine — no driver-side collect."""
        from pyspark.sql import functions as F

        req = [c.name for c in self.columns if c.required]
        if not req:
            return df, df.limit(0)
        bad = None
        for c in req:
            cond = F.col(c).isNull()
            bad = cond if bad is None else (bad | cond)
        return df.filter(~bad), df.filter(bad)

    def to_spark(self) -> T.StructType:
        fields = [c.spark_field() for c in self.columns]
        if not self.strict:
            fields.append(T.StructField(self.REST_COLUMN, T.StringType(), True))
        return T.StructType(fields)


def materialize_computed_columns(df, schema: "TableSchema"):
    """Computed (virtual) key columns (TColumnSchema::Expression,
    yt/yt/client/table_client/schema.h; evaluated by TColumnEvaluator,
    engine_api/column_evaluator.h:12): evaluate each column's Spark SQL
    expression at write time. The reference uses these to shard
    (farm_hash(k) % n); here the materialized column serves the same role
    as a partition/bucket key."""
    from pyspark.sql import functions as F

    for col in schema.columns:
        if col.expression:
            df = df.withColumn(col.name, F.expr(col.expression))
    return df


def yt_type_to_spark(name: str) -> T.DataType:
    """Resolve a YT logical type string, including composites:
    ``optional<T>``, ``list<T>``, ``dict<K,V>``, ``struct<a:T,b:U>``,
    ``tuple<T,U>`` (positional fields ``_1,_2..``), ``decimal(p,s)``,
    ``variant<...>`` (tagged struct of nullables), ``tagged<tag,T>``."""
    s = name.strip().lower()
    if s in SIMPLE_TYPE_MAP:
        return SIMPLE_TYPE_MAP[s]
    if s.startswith("optional<") and s.endswith(">"):
        return yt_type_to_spark(s[len("optional<"):-1])  # nullability is per-field
    if s.startswith("list<") and s.endswith(">"):
        return T.ArrayType(yt_type_to_spark(s[len("list<"):-1]))
    if s.startswith("dict<") and s.endswith(">"):
        k, v = _split_top(s[len("dict<"):-1])
        return T.MapType(yt_type_to_spark(k), yt_type_to_spark(v))
    if s.startswith("decimal(") and s.endswith(")"):
        p, sc = s[len("decimal("):-1].split(",")
        return T.DecimalType(int(p), int(sc))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_all(s[len("struct<"):-1]):
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), yt_type_to_spark(ftype), True))
        return T.StructType(fields)
    if s.startswith("tuple<") and s.endswith(">"):
        parts = _split_all(s[len("tuple<"):-1])
        return T.StructType(
            [T.StructField(f"_{i+1}", yt_type_to_spark(p), True) for i, p in enumerate(parts)]
        )
    if s.startswith("variant<") and s.endswith(">"):
        # No native variant: tagged struct of nullable alternatives + tag.
        parts = _split_all(s[len("variant<"):-1])
        fields = [T.StructField("_tag", T.IntegerType(), False)]
        for i, p in enumerate(parts):
            if ":" in p and not p.split(":", 1)[0].strip().startswith(("list", "dict", "struct", "tuple")):
                fname, ftype = p.split(":", 1)
                fields.append(T.StructField(fname.strip(), yt_type_to_spark(ftype), True))
            else:
                fields.append(T.StructField(f"_{i+1}", yt_type_to_spark(p), True))
        return T.StructType(fields)
    if s.startswith("tagged<") and s.endswith(">"):
        _tag, inner = _split_top(s[len("tagged<"):-1])
        return yt_type_to_spark(inner)
    raise ValueError(f"unknown YT type: {name!r}")


def spark_type_to_yt(dt: T.DataType) -> str:
    """Inverse mapping for schema export."""
    simple = {
        T.ByteType: "int8", T.ShortType: "int16", T.IntegerType: "int32",
        T.LongType: "int64", T.FloatType: "float", T.DoubleType: "double",
        T.BooleanType: "boolean", T.StringType: "utf8", T.DateType: "date",
        T.TimestampType: "timestamp", T.NullType: "null",
        T.BinaryType: "string", T.DayTimeIntervalType: "interval",
    }
    for cls, name in simple.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_type_to_yt(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"dict<{spark_type_to_yt(dt.keyType)},{spark_type_to_yt(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_type_to_yt(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    raise ValueError(f"unmapped Spark type: {dt}")


def _split_top(s: str) -> tuple[str, str]:
    parts = _split_all(s)
    if len(parts) != 2:
        raise ValueError(f"expected two type args in {s!r}")
    return parts[0], parts[1]


def _split_all(s: str) -> list[str]:
    """Split on commas at bracket depth 0."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


# --- schema evolution (check_schema_compatibility.cpp, merge_table_schemas.cpp)

_INT_WIDEN = ["int8", "int16", "int32", "int64"]
_UINT_WIDEN = ["uint8", "uint16", "uint32", "uint64"]
_FLOAT_WIDEN = ["float", "double"]


def _type_compat(old: str, new: str) -> str:
    """'ok' if every old value fits the new type, 'validate' if it may,
    'bad' otherwise. Widening within a numeric family is safe; narrowing
    needs validation; cross-family is incompatible — the reference's
    simple-type compatibility lattice
    (yt/yt/client/table_client/check_schema_compatibility.cpp)."""
    o, n = old.strip().lower(), new.strip().lower()
    if o == n:
        return "ok"
    for fam in (_INT_WIDEN, _UINT_WIDEN, _FLOAT_WIDEN):
        if o in fam and n in fam:
            return "ok" if fam.index(o) <= fam.index(n) else "validate"
    if {o, n} == {"string", "utf8"}:
        # utf8 ⊂ string: widening ok, narrowing needs validation
        return "ok" if o == "utf8" else "validate"
    return "bad"


def check_schema_compatibility(
    old: "TableSchema", new: "TableSchema"
) -> str:
    """Can data written under ``old`` be read/ingested under ``new``?

    Returns "fully_compatible" | "requires_validation" | "incompatible" —
    the three-way verdict of the reference's
    ``CheckTableSchemaCompatibility`` (check_schema_compatibility.cpp):

    - matching columns: new type must equal or widen the old type
      (narrowing → validation; cross-family → incompatible);
    - required→optional is free; optional→required needs validation
      (nulls may exist);
    - a NEW required column with no old counterpart is incompatible
      (old rows cannot supply it); new optional columns are free;
    - dropping a column is incompatible under a strict new schema
      (old rows carry data the schema forbids) but fine under a weak one;
    - the sorted key prefix must be preserved in order and sort
      direction — re-keying is a Sort operation, not an evolution.
    """
    verdict = "fully_compatible"

    def worsen(v: str) -> None:
        nonlocal verdict
        order = ["fully_compatible", "requires_validation", "incompatible"]
        if order.index(v) > order.index(verdict):
            verdict = v

    new_by_name = {c.name: c for c in new.columns}
    old_by_name = {c.name: c for c in old.columns}
    for oc in old.columns:
        nc = new_by_name.get(oc.name)
        if nc is None:
            worsen("incompatible" if new.strict else "fully_compatible")
            continue
        t = _type_compat(oc.type_name, nc.type_name)
        if t == "bad":
            worsen("incompatible")
        elif t == "validate":
            worsen("requires_validation")
        if nc.required and not oc.required:
            worsen("requires_validation")
    for nc in new.columns:
        if nc.name not in old_by_name and nc.required:
            worsen("incompatible")
    old_keys = [(c.name, c.sort_order) for c in old.columns if c.sort_order]
    new_keys = [(c.name, c.sort_order) for c in new.columns if c.sort_order]
    if len(new_keys) > len(old_keys):
        # Widening the sorted key prefix is NOT an evolution: existing data
        # is not sorted by the added key columns
        # (check_schema_compatibility.cpp:183-190 returns Incompatible).
        worsen("incompatible")
    elif new_keys != old_keys[: len(new_keys)]:
        worsen("incompatible")
    if new.unique_keys:
        # Output uniqueness needs input uniqueness over the SAME key set:
        # a shorter key can collapse distinct old keys into duplicates.
        if not old.unique_keys or len(new_keys) != len(old_keys):
            worsen("incompatible")
    return verdict


def merge_table_schemas(a: "TableSchema", b: "TableSchema") -> "TableSchema":
    """Smallest schema both inputs fit into (merge_table_schemas.cpp; used
    by Merge operations over heterogeneous inputs and by weak-schema
    inference): shared columns widen to the common supertype, optionality
    ORs, one-sided columns become optional, keys keep the longest common
    sorted prefix, strictness ANDs."""

    def widen(x: str, y: str) -> str:
        if _type_compat(x, y) == "ok":
            return y
        if _type_compat(y, x) == "ok":
            return x
        raise ValueError(f"no common supertype for {x!r} and {y!r}")

    b_by_name = {c.name: c for c in b.columns}
    common_keys: list[str] = []
    for ca, cb in zip(
        [c for c in a.columns if c.sort_order], [c for c in b.columns if c.sort_order]
    ):
        if ca.name == cb.name and ca.sort_order == cb.sort_order:
            common_keys.append(ca.name)
        else:
            break
    merged: list[ColumnSchema] = []
    seen = set()
    for ca in a.columns:
        cb = b_by_name.get(ca.name)
        seen.add(ca.name)
        if cb is None:
            merged.append(replace(ca, required=False, sort_order=None))
        else:
            merged.append(
                replace(
                    ca,
                    type_name=widen(ca.type_name, cb.type_name),
                    required=ca.required and cb.required,
                    sort_order=ca.sort_order if ca.name in common_keys else None,
                )
            )
    for cb in b.columns:
        if cb.name not in seen:
            merged.append(replace(cb, required=False, sort_order=None))
    return TableSchema(
        columns=merged, strict=a.strict and b.strict, unique_keys=False
    )
