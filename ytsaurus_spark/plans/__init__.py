"""Plan introspection helpers (pushdown / broadcast / shuffle assertions)."""

from ytsaurus_spark.plans.explain import (  # noqa: F401
    broadcast_join_count,
    executed_scan_tables,
    formatted_plan,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
    unpartitioned_window_count,
)
