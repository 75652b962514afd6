"""MATCH_RECOGNIZE (row pattern matching) as a Spark composition.

Reference: YQL's MATCH_RECOGNIZE (yql/essentials/sql/v1/sql_match_recognize.cpp,
exec mkql_match_recognize.cpp) — DEFINE row predicates as symbols, match a
regex-like PATTERN over the ordered row sequence per partition.

Spark lacks a native operator; SURVEY §7 flagged it as a hard part. This
implements the core subset as a composition of built-ins:

1. DEFINE    → each symbol is a Column predicate; rows encode to one char
               (first matching symbol wins, '.' when none match).
2. ORDER     → sort_array(collect_list(struct(order_keys..., char))) builds
               the per-partition symbol string in row order.
3. PATTERN   → a regular expression over symbol chars; matches counted /
               extracted with regexp_count / regexp_extract_all.

Supported: concatenation, alternation, quantifiers (* + ? {n,m}) — anything
Java regex supports over the symbol alphabet. Not supported (documented):
MEASURES over per-match aggregates, AFTER MATCH SKIP policies other than
PAST LAST ROW (non-overlapping regex scan), and per-row navigation
(PREV/NEXT inside DEFINE).

Scale: state per partition key is the encoded symbol string (1 byte/row) —
bounded by per-key sequence length, the same bound the reference's
streaming matcher carries. The whole pipeline is one groupBy shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_symbols(
    df: DataFrame,
    symbols: list[tuple[str, Column]],
    default: str = ".",
) -> Column:
    """Row → single-char symbol; first matching DEFINE predicate wins."""
    expr = F.lit(default)
    for ch, pred in reversed(symbols):
        if len(ch) != 1:
            raise ValueError(f"symbol must be one char, got {ch!r}")
        expr = F.when(pred, F.lit(ch)).otherwise(expr)
    return expr


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    symbols: list[tuple[str, Column]],
    pattern: str,
) -> DataFrame:
    """Count + extract non-overlapping PATTERN matches per partition.

    Returns (partition_by..., n_matches, matches) where ``matches`` is the
    comma-joined matched symbol substrings in order — enough to measure
    match lengths and classifier sequences downstream."""
    sym = encode_symbols(df, symbols).alias("__sym")
    seq = (
        df.select(*partition_by, *order_by, sym)
        .groupBy(*partition_by)
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct("
                    + ", ".join(order_by)
                    + ", __sym))), x -> x.__sym)"
                ),
                "",
            ).alias("__seq")
        )
    )
    return seq.select(
        *partition_by,
        F.regexp_count("__seq", F.lit(pattern)).cast("long").alias("n_matches"),
        F.array_join(F.regexp_extract_all("__seq", F.lit(f"({pattern})"), 1), ",").alias(
            "matches"
        ),
    )
