"""QL builtin function surface (SURVEY §2.1) as Spark column functions.

Reference registry: yt/yt/library/query/base/builtin_function_registry.cpp
(scalar) and builtin_function_types.cpp (aggregates); C/LLVM implementations
under yt/yt/library/query/engine/udf/. Every function here is a thin
composition of JVM-side ``pyspark.sql.functions`` — nothing drops to Python,
so the whole surface stays inside whole-stage codegen.

Naming: QL name → same-name Python callable where legal (``if`` → ``if_``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "if_", "if_null", "is_null", "is_nan", "is_finite",
    "is_prefix", "is_substr", "lower_", "length_", "concat_",
    "numeric_to_string", "parse_int64", "parse_uint64", "parse_double",
    "regex_full_match", "regex_partial_match", "regex_replace_first",
    "regex_replace_all", "regex_extract", "regex_escape",
    "farm_hash", "format_timestamp",
    "timestamp_floor_hour", "timestamp_floor_day", "timestamp_floor_week",
    "timestamp_floor_month", "timestamp_floor_year",
    "try_get_int64", "try_get_uint64", "try_get_double", "try_get_boolean",
    "try_get_string", "ypath_get",
    "make_list", "make_map", "list_contains", "list_has_intersection",
    "yson_length", "greatest_", "transform_values",
    "argmin", "argmax", "cardinality", "dict_sum", "xdelta_first",
]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# --- conditionals / null handling (udf/is_null.c, registry :60-120) ---------

def if_(cond, then, otherwise) -> Column:
    return F.when(_c(cond), _c(then)).otherwise(_c(otherwise))


def if_null(x, default) -> Column:
    return F.coalesce(_c(x), _c(default))


def is_null(x) -> Column:
    return _c(x).isNull()


def is_nan(x) -> Column:
    return F.isnan(_c(x))


def is_finite(x) -> Column:
    col = _c(x)
    return ~(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))))


# --- strings (udf/is_prefix.c, is_substr.c, lower.cpp, concat.c) -----------

def is_prefix(prefix, s) -> Column:
    return _c(s).startswith(_c(prefix))


def is_substr(sub, s) -> Column:
    return _c(s).contains(_c(sub))


def lower_(s) -> Column:
    return F.lower(_c(s))


def length_(s) -> Column:
    return F.length(_c(s))


def concat_(*cols) -> Column:
    return F.concat(*[_c(c) for c in cols])


def numeric_to_string(x) -> Column:
    return _c(x).cast("string")


def parse_int64(s) -> Column:
    return _c(s).cast("long")


def parse_uint64(s) -> Column:
    # Spark has no unsigned; parse as decimal(20,0) so 2^63..2^64-1 survive.
    return _c(s).cast("decimal(20,0)")


def parse_double(s) -> Column:
    return _c(s).cast("double")


# --- regex family (udf/regex.cpp — re2 semantics ≈ Java regex here) --------

def regex_full_match(pattern: str, s) -> Column:
    return _c(s).rlike(f"^(?:{pattern})$")


def regex_partial_match(pattern: str, s) -> Column:
    return _c(s).rlike(pattern)


def regex_replace_first(pattern: str, s, rewrite: str) -> Column:
    # Spark regexp_replace is replace-all; anchor the first occurrence by
    # capturing everything before it, which is what re2 ReplaceFirst does.
    return F.regexp_replace(_c(s), f"^((?:(?!{pattern}).)*?){pattern}", f"$1{rewrite}")


def regex_replace_all(pattern: str, s, rewrite: str) -> Column:
    return F.regexp_replace(_c(s), pattern, rewrite)


def regex_extract(pattern: str, s, idx: int = 1) -> Column:
    return F.regexp_extract(_c(s), pattern, idx)


def regex_escape(s) -> Column:
    return F.regexp_replace(_c(s), r"([.^$|()\[\]{}*+?\\])", r"\\$1")


# --- hashes / guids (udf/farm_hash.c, registry :250-278) -------------------

def farm_hash(*cols) -> Column:
    """Shard-routing hash. Bit-compat with FarmHash is NOT preserved (the
    reference only needs it for computed shard keys, which Spark's hash
    partitioner replaces); xxhash64 gives the same statistical properties."""
    return F.xxhash64(*[_c(c) for c in cols])


# --- timestamps (registry :279-310, udf/dates.cpp) -------------------------

def format_timestamp(ts, fmt: str) -> Column:
    return F.date_format(_c(ts), fmt)


def timestamp_floor_hour(ts) -> Column:
    return F.date_trunc("hour", _c(ts))


def timestamp_floor_day(ts) -> Column:
    return F.date_trunc("day", _c(ts))


def timestamp_floor_week(ts) -> Column:
    return F.date_trunc("week", _c(ts))


def timestamp_floor_month(ts) -> Column:
    return F.date_trunc("month", _c(ts))


def timestamp_floor_year(ts) -> Column:
    return F.date_trunc("year", _c(ts))


# --- YSON 'Any' access (udf/ypath_get.cpp; Any ≡ JSON string column) -------

def ypath_get(any_col, path: str) -> Column:
    """``/a/b`` YPath → ``$.a.b`` JSONPath over the JSON-encoded Any column."""
    jpath = "$" + path.replace("/", ".")
    return F.get_json_object(_c(any_col), jpath)


def try_get_int64(any_col, path: str) -> Column:
    return ypath_get(any_col, path).cast("long")


def try_get_uint64(any_col, path: str) -> Column:
    return ypath_get(any_col, path).cast("decimal(20,0)")


def try_get_double(any_col, path: str) -> Column:
    return ypath_get(any_col, path).cast("double")


def try_get_boolean(any_col, path: str) -> Column:
    return ypath_get(any_col, path).cast("boolean")


def try_get_string(any_col, path: str) -> Column:
    return ypath_get(any_col, path)


# --- composite constructors / list ops (udf/make_map.cpp etc.) -------------

def make_list(*cols) -> Column:
    return F.array(*[_c(c) for c in cols])


def make_map(*cols) -> Column:
    return F.create_map(*[_c(c) for c in cols])


def list_contains(lst, x) -> Column:
    return F.array_contains(_c(lst), x)


def list_has_intersection(a, b) -> Column:
    return F.arrays_overlap(_c(a), _c(b))


def yson_length(col) -> Column:
    return F.size(_c(col))


def greatest_(*cols) -> Column:
    return F.greatest(*[_c(c) for c in cols])


def transform_values(col, sources: list, targets: list, default=None) -> Column:
    """QL TRANSFORM(expr, [from...], [to...], default) — literal value remap
    (TTransformExpression, yt/yt/library/query/base/ast.h:337-359).
    Compiled to a chained CASE WHEN so it stays in codegen."""
    expr = _c(col)
    out = F.lit(default) if default is not None else F.lit(None)
    for s, t in zip(reversed(sources), reversed(targets)):
        out = F.when(expr == F.lit(s), F.lit(t)).otherwise(out)
    return out


# --- aggregates (builtin_function_types.cpp :217-270) ----------------------

def argmin(value, by) -> Column:
    """QL argmin(v, b) = value of v at minimal b → Spark min_by."""
    return F.min_by(_c(value), _c(by))


def argmax(value, by) -> Column:
    return F.max_by(_c(value), _c(by))


def cardinality(col, rsd: float = 0.01) -> Column:
    """QL cardinality() = HyperLogLog distinct estimate
    (udf/hyperloglog.cpp) → approx_count_distinct. rsd=0.01 matches the
    reference's 2^14-register precision better than Spark's 0.05 default."""
    return F.approx_count_distinct(_c(col), rsd)


def dict_sum(map_col) -> Column:
    """QL dict_sum aggregate: element-wise sum of map values across rows.
    Expressed as explode→sum→map reassembly by callers; this helper gives the
    per-group expression form used after an explode."""
    return F.map_from_entries(F.collect_list(_c(map_col)))


def xdelta_first(col, order_col=None) -> Column:
    """xdelta merges binary patches server-side; keeping the first-written
    value is the semantic fallback documented in SURVEY §2.1 (no public
    patch format to honor). Pass ``order_col`` (write generation / row
    index) to make "first" deterministic: the non-null value with the
    lowest order wins. Without it, falls back to F.first, which Spark does
    not guarantee to be stable over an unordered groupBy."""
    c = _c(col)
    if order_col is None:
        return F.first(c, ignorenulls=True)
    pair = F.when(c.isNotNull(), F.struct(_c(order_col).alias("g"), c.alias("v")))
    return F.min(pair).getField("v")
