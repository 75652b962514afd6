"""Plan introspection helpers (pushdown / broadcast / shuffle assertions)."""

from ytsaurus_spark.plans.explain import (  # noqa: F401
    ALLOWED_CARTESIAN,
    ALLOWED_GLOBAL_WINDOWS,
    broadcast_join_count,
    executed_scan_tables,
    formatted_plan,
    has_pushed_filters,
    plan_audit_findings,
    scan_read_schema,
    shuffle_count,
    unpartitioned_window_count,
)
