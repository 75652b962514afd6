"""Physical-plan introspection: the tooling used to keep every operator's
plan honest at scale (filters reach the parquet scan, small dims broadcast,
no gratuitous exchanges).

The reference gets these properties from hand-built range inference and
join strategy selection (new_range_inferrer.cpp, yql_yt_join_impl.cpp);
Catalyst gives them declaratively — these helpers make tests fail when a
code change silently loses one.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, column: str | None = None) -> bool:
    """True if the scan carries PushedFilters (optionally naming a column)."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if not m:
        return False
    if column is None:
        return any(x.strip() for x in m)
    return any(column in x for x in m)


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Columns the parquet scan actually reads (projection pushdown proof)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(
            f.split(":", 1)[0].strip() for f in m.group(1).split(",") if f.strip()
        )
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of Window operators with an EMPTY partition spec — each one
    moves its whole input to a single task (Spark's WindowExec warning).
    A physical-plan Window line prints
    ``Window [exprs], [partSpec], [orderSpec]`` when partitioned-and-
    ordered, ``Window [exprs], [partSpec]`` when partition-only (whole-
    partition frame, no ORDER BY — still distributed),
    ``Window [exprs], [orderSpec]`` when global-with-order, and bare
    ``Window [exprs]`` (zero separators) when global-without-order
    (e.g. ``sum(x) OVER ()``).  The two-group forms are told apart by
    sort-direction markers: an order spec prints ``col ASC|DESC NULLS …``
    while a partition spec never carries a direction.  Guarded by
    ``test_plans.py::test_unpartitioned_window_detector`` against both
    global forms regressing to undetected."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = 0
    for line in plan.splitlines():
        if "Window [" in line and "windowspecdefinition" in line:
            seps = line.count("], [")
            if seps == 0:
                n += 1  # bare Window [exprs]: neither partition nor order
            elif seps == 1:
                tail = line.rsplit("], [", 1)[-1]
                if " ASC " in tail or " DESC " in tail:
                    n += 1  # second group is an ORDER spec -> no partition
    return n


# Documented exceptions to the no-global-window rule: queries whose window
# INPUT is dim-sized by construction, kept because they demonstrate the
# window surface itself. Anything fact-scale must use the histogram /
# prefix_sum decomposition (see agg_histogram_equidepth,
# analytics_customer_deciles, text_textrank_keywords). The allowlist covers
# ONLY the global-window finding — a CartesianProduct flags regardless.
ALLOWED_GLOBAL_WINDOWS = {
    "win_ranks": "window-surface demo over the 2k-row part dim",
    "win_range_frame": "RANGE-frame demo over the part dim",
    # verbatim reference bench text (queries/yql_q.py) — the rank() calls
    # are unpartitioned in the original SQL, and their inputs are
    # item-grain aggregates (bounded by |item|, a dim) by construction
    "yql_q44": "verbatim TPC-DS q44: ranks item-grain avg-profit aggregates",
    "yql_q49": "verbatim TPC-DS q49: ranks item-grain return-ratio "
               "aggregates per channel",
    # the reference's HAND-OPTIMIZED q49 variant (queries_optimized/49.sql,
    # run verbatim by queries/yql_opt_q.py) keeps the original's
    # unpartitioned rank() calls over the same item-grain aggregates —
    # identical bounded-input contract as yql_q49 above
    "yql_o49": "verbatim optimized TPC-DS q49: same item-grain rank "
               "inputs as yql_q49",
}

GLOBAL_WINDOW = "global window(s)"

# Documented exceptions to the no-CartesianProduct rule. Unlike the window
# allowlist (demo queries), this covers ONLY verbatim reference bench text
# whose cross joins are bounded by construction but which pre-AQE size
# estimation cannot see: a CTE aggregate's size estimate falls back to its
# fact-sized child without column statistics, so Catalyst plans
# CartesianProduct where the RUNTIME sides are a channel-grain aggregate
# (≤ |call centers| rows) × a global 1-row aggregate. Engine-authored
# queries must never appear here — compose the scalar via a broadcast or
# a windowless aggregate instead.
ALLOWED_CARTESIAN = {
    "yql_q77": "verbatim TPC-DS q77: `$cs cross join $cr` where cs is a "
               "call-center-grain aggregate and cr a global 1-row "
               "aggregate; both sides dim-bounded at runtime",
}


def plan_audit_findings(
    df: DataFrame,
    allow_global: bool = False,
    allow_cartesian: bool = False,
) -> list[str]:
    """Scale anti-patterns in a frame's physical plan: unpartitioned
    windows (single-task sort of the whole input) and CartesianProduct
    operators. Shared by tools/audit_plans.py and the whole-registry
    pytest gate (tests/test_plan_audit.py) so `done: 0 flagged` is
    enforced, not aspirational. Broadcast nested-loop joins over 1-row
    aggregates are the scalar-crossJoin idiom and print as
    BroadcastNestedLoopJoin, not CartesianProduct — they don't trip this.
    ``allow_cartesian`` is for ALLOWED_CARTESIAN's verbatim bench text
    only (bounded sides the estimator cannot prove)."""
    findings = []
    n_global = unpartitioned_window_count(df)
    if n_global and not allow_global:
        findings.append(f"{n_global} {GLOBAL_WINDOW}")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_cart = plan.count("CartesianProduct")
    if n_cart and not allow_cartesian:
        findings.append(f"{n_cart} CartesianProduct")
    return findings


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each = one shuffle stage). Counts only
    numbered plan nodes, not mentions in argument/reuse lines."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def executed_scan_tables(df: DataFrame, run: bool = True) -> dict[str, int]:
    """Per-table FileScan counts in the FINAL (post-AQE) physical plan —
    the honest multi-consumer metric: AQE inserts ReusedExchange at
    runtime, so the pre-execution plan over-counts shared subtrees, and
    the executed toString concatenates final + initial plans (only the
    final section is parsed). ``run=True`` collects the frame first so
    the adaptive plan is final."""
    if run:
        df.collect()
    # Parse the final section of the executed plan's toString: it is the
    # only rendering that collapses runtime-reused subtrees (formatted
    # explain re-prints a scan under every ReusedExchange consumer, which
    # over-counts shared reads). Location paths truncate mid-line there,
    # so tables are identified by the scan's column prefix instead.
    prefix_to_table = {
        "l": "lineitem", "o": "orders", "c": "customer", "n": "nation",
        "r": "region", "p": "part", "s": "supplier", "ev": "events",
        "doc": "documents", "emb": "embeddings",
    }
    full = df._jdf.queryExecution().executedPlan().toString()
    final = full.split("== Initial Plan ==")[0]
    # A persisted frame prints its cached child plan (FileScan included)
    # under EVERY InMemoryTableScan consumer, but the parquet read runs
    # exactly once — at cache materialization. Count a FileScan nested
    # under InMemoryRelation once per DISTINCT cached relation (keyed by
    # the scan's printed signature), and every uncached FileScan as-is.
    out: dict[str, int] = {}
    cache_depths: list[int] = []  # indents of open InMemoryRelation blocks
    seen_cached_scans: set[str] = set()

    def _indent(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        return m.start() if m else 0

    for line in final.splitlines():
        ind = _indent(line)
        while cache_depths and ind <= cache_depths[-1]:
            cache_depths.pop()
        if "InMemoryRelation" in line:
            cache_depths.append(ind)
            continue
        m = re.search(r"FileScan \w+ \[([A-Za-z_0-9]*)", line)
        if not m:
            continue
        if cache_depths:
            sig = line[m.start():].strip()
            if sig in seen_cached_scans:
                continue
            seen_cached_scans.add(sig)
        first_col = m.group(1)
        prefix = first_col.split("_", 1)[0] if first_col else ""
        table = prefix_to_table.get(prefix, f"?{first_col}")
        out[table] = out.get(table, 0) + 1
    return out
