"""Unicode normalization + multi-pattern matching scalar modules.

Reference parity:

- ``Unicode::Normalize/NormalizeNFC/NFD/NFKC/NFKD``, ``ToLower``/
  ``ToUpper``/``Fold``, ``GetLength``, ``LevensteinDistance`` … —
  ``yql/essentials/udfs/common/unicode_base/lib/unicode_base_udf.h:821-858``.
  Most of the family maps to JVM-side builtins (``lower``/``upper``/
  ``length``/``reverse``/``levenshtein``/``ascii``); the normalization
  forms need Python's ``unicodedata`` behind an Arrow-batched Pandas UDF
  (no normalization builtin in Spark SQL) — batch transfer, never
  row-at-a-time.

- ``Hyperscan::Grep/MultiGrep/MultiMatch`` and the Pire equivalents
  (``yql/essentials/udfs/common/hyperscan``, ``.../pire``): the public
  semantic is "compile N patterns into ONE scan". Here the compilation
  target is a single alternation regex evaluated by the JVM regex engine
  inside codegen — one pass over the string for the any-match case, and a
  per-pattern bitmask for MultiGrep. At 100 TB this is a scan-stage
  expression with zero Python and zero extra passes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _normalizer(form: str):
    import unicodedata

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return norm


# Arrow-batched normalizers, one per Unicode normalization form
normalize_nfc = _normalizer("NFC")
normalize_nfd = _normalizer("NFD")
normalize_nfkc = _normalizer("NFKC")
normalize_nfkd = _normalizer("NFKD")


@pandas_udf("string")
def casefold(s: pd.Series) -> pd.Series:
    """Unicode::Fold — full case folding (ß→ss etc.), beyond lower()."""
    return s.map(lambda x: x.casefold() if x is not None else None)


def _alternation(patterns: list[str]) -> str:
    if not patterns:
        raise ValueError("multi_grep needs at least one pattern")
    return "|".join(f"(?:{p})" for p in patterns)


def multi_grep_any(col, patterns: list[str]) -> Column:
    """True if ANY pattern matches — Hyperscan::Grep over a multi-pattern
    database: one compiled alternation, one scan of the string."""
    return F.col(col).rlike(_alternation(patterns)) if isinstance(col, str) else col.rlike(_alternation(patterns))


def multi_grep_mask(col, patterns: list[str]) -> Column:
    """Bitmask of which patterns match (bit i = pattern i) —
    Hyperscan::MultiGrep's tuple-of-bools as an integer the optimizer can
    aggregate without arrays."""
    c = F.col(col) if isinstance(col, str) else col
    mask = F.lit(0)
    for i, p in enumerate(patterns):
        mask = mask + F.when(c.rlike(p), F.lit(1 << i)).otherwise(F.lit(0))
    return mask.cast("long")


def multi_grep_flags(col, patterns: list[str]) -> Column:
    """Array<boolean>, one per pattern — the literal MultiGrep shape."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[c.rlike(p) for p in patterns])
