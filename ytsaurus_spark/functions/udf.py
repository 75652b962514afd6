"""UDF / UDAF / UDTF surface (SURVEY §2.7).

Reference: QL UDFs are LLVM/WASM modules fetched from a Cypress registry
(client_dynamic_tables_impl.cpp:1657); MapReduce user jobs are arbitrary
executables over rows (job_proxy/user_job.cpp) — the universal UDTF; YQL
adds Python/JS UDFs and UDAF factories (aggregate.yqls).

Spark's native idiom is the strongest alignment in the whole mapping:

- scalar UDF        → ``@F.udf`` (row) / ``@F.pandas_udf`` (Arrow, 10-100×)
- UDAF              → ``pandas_udf`` GROUPED_AGG
- UDTF (table fn)   → ``@udtf`` (Spark 3.5+) — rows in, rows out
- user job          → ``mapInPandas`` / ``applyInPandas`` (operators/map_reduce)

This module provides a UDF *registry* in the spirit of the reference's
Cypress registry: named registration + SQL exposure, so ``select_rows``
query strings can call registered user functions by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_REGISTRY: dict[str, Callable] = {}


def register_udf(spark: SparkSession, name: str, fn: Callable, return_type: str) -> None:
    """Register a scalar Python UDF under a QL-callable name (slow path —
    prefer register_pandas_udf)."""
    udf = F.udf(fn, return_type)
    _REGISTRY[name] = udf
    spark.udf.register(name, udf)


def register_pandas_udf(spark: SparkSession, name: str, fn: Callable, return_type: str) -> None:
    """Register an Arrow-vectorized UDF — the production path: one Python
    call per batch, columnar transfer, usable from SQL and select_rows."""
    udf = F.pandas_udf(fn, return_type)
    _REGISTRY[name] = udf
    spark.udf.register(name, udf)


def register_udtf(spark: SparkSession, name: str, cls, return_type: str) -> None:
    """Register a Python UDTF (table function): the analog of the
    reference's user-job-as-operator — rows in, multiple rows out, callable
    from SQL as ``SELECT * FROM name(...)``."""
    from pyspark.sql.functions import udtf as _udtf

    wrapped = _udtf(cls, returnType=return_type)
    _REGISTRY[name] = wrapped
    spark.udtf.register(name, wrapped)


def get_registered(name: str) -> Callable:
    return _REGISTRY[name]
