"""Weak (non-strict) schema support: schemaless rows as declared columns +
a JSON overflow column, with schema inference.

Reference: schema mode Weak = rows are free-form attribute maps
(yt/yt/client/table_client/public.h:151-154); merge specs can infer a
schema from data (``schema_inference_mode``, spec_builders.py:1946-1948).

Spark shape: the overflow lives in a ``_rest`` JSON string column (see
yt_types.TableSchema strict=False). ``infer_rest_schema`` samples the JSON
to discover keys+types (the schema_inference_mode analog), and
``promote_rest_columns`` lifts chosen keys into typed first-class columns —
the weak→strong migration path. Sampling is bounded; at 100 TB inference
reads ``sample_rows`` rows, never the table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_rest_schema(
    df: DataFrame, rest_col: str = "_rest", sample_rows: int = 1000
) -> dict[str, str]:
    """Sample the JSON overflow column and infer {key: spark_type}.

    Types widen across samples: long → double → string (the same lattice
    YT's inference uses for schemaless input)."""
    rows = (
        df.select(rest_col)
        .filter(F.col(rest_col).isNotNull())
        .limit(sample_rows)
        .collect()
    )
    lattice = {"bigint": 0, "double": 1, "boolean": 0.5, "string": 2}
    inferred: dict[str, str] = {}
    for r in rows:
        try:
            obj = json.loads(r[0])
        except (json.JSONDecodeError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            if isinstance(v, bool):
                t = "boolean"
            elif isinstance(v, int):
                t = "bigint"
            elif isinstance(v, float):
                t = "double"
            else:
                t = "string"
            prev = inferred.get(k)
            if prev is None:
                inferred[k] = t
                continue
            if prev == t:
                continue
            # bool mixed with anything else degrades to string (there is no
            # numeric widening that preserves both)
            if "boolean" in (prev, t):
                inferred[k] = "string"
            elif lattice[t] > lattice[prev]:
                inferred[k] = t
    return inferred


def promote_rest_columns(
    df: DataFrame,
    schema: dict[str, str] | None = None,
    rest_col: str = "_rest",
    drop_rest: bool = False,
) -> DataFrame:
    """Lift overflow keys into typed columns (weak → strong migration).
    Extraction is get_json_object + cast — JVM-side, scan-speed."""
    schema = schema or infer_rest_schema(df, rest_col)
    for key, t in schema.items():
        df = df.withColumn(
            key, F.get_json_object(F.col(rest_col), f"$.{key}").cast(t)
        )
    return df.drop(rest_col) if drop_rest else df
