"""Query registry: every implemented operator from SURVEY.md §2 shows up here
as a named (spark_fn, oracle_sql) pair.

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine-side implementation.
- ``oracle_sql`` — equivalent ANSI SQL for DuckDB over the same parquet
  tables (views pre-registered by the driver), or ``None`` for ops that
  aren't SQL-expressible (the driver then records a rows-only check).

Conventions that keep Spark and DuckDB hash-identical:
- alias every computed column identically on both sides;
- wrap double aggregates in ``round(x, N)`` on both sides (summation order
  differs between engines; rounding removes last-ulp noise);
- cast DuckDB integer ``sum()`` to BIGINT (DuckDB widens to HUGEINT);
- project timestamps through a shared string format.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _with_session_bootstrap(fn: SparkQuery) -> SparkQuery:
    """Wrap a query so a caller-provided session is self-configured first
    (nanosAsLong / UTC / Arrow confs) — see session.ensure_runtime_confs.
    Catalog.__post_init__ does the same; this covers queries that build
    inputs without going through the catalog."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ytsaurus_spark.session import ensure_runtime_confs

        ensure_runtime_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return {k: _with_session_bootstrap(v[0]) for k, v in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: modules call register() at import time
    from ytsaurus_spark.queries import (  # noqa: F401
        aggregates,
        analytics_q,
        curation_q,
        dynamic_q,
        formats_q,
        llm,
        mapreduce,
        ql,
        streaming_q,
        surface_q,
        tpcds2_q,
        tpcds_q,
        windows,
    )

    _LOADED = True
