"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke-check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (and the LLM
pipeline extras), one callable per name.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for ops that
aren't SQL-expressible; the driver then records a rows-only check).

Implementations live in ``ytsaurus_spark.queries.*``; this module is a thin
re-export so the engine package stays importable on its own.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ytsaurus_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape — scan→filter→group→agg) on sf0.001."""
    from ytsaurus_spark.queries.ql import ql_group_agg

    return ql_group_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
