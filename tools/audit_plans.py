"""Whole-registry plan-shape audit: build every registered query's physical
plan and flag the scale anti-patterns the per-family gates check piecemeal —
global (unpartitioned) windows and CartesianProduct operators. (Broadcast
nested-loop joins over 1-row aggregates are the scalar-crossJoin idiom and
print as BroadcastNestedLoopJoin, not CartesianProduct, so they don't trip
this. Pushdown/pruning stay covered by the targeted tests in
tests/test_plans.py — a generic sweep can't know which scans SHOULD carry
filters.)

Queries that EXECUTE work at build time (streaming memory-sink drains,
durable-commit dyn_* pipelines, format writers) still only run sf-sized
work; the audit is read-only and safe at sf0.001/sf0.01.

Usage: python tools/audit_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ytsaurus_spark.plans import (
    ALLOWED_CARTESIAN,
    ALLOWED_GLOBAL_WINDOWS,
    plan_audit_findings,
)
from ytsaurus_spark.queries import all_queries
from ytsaurus_spark.session import get_spark


GLOBAL_WINDOW = "global window(s)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit", shuffle_partitions=8)
    bad = 0
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            findings = plan_audit_findings(df)
        except Exception:
            print(f"ERROR {name}")
            traceback.print_exc(limit=2)
            bad += 1
            continue
        if name in ALLOWED_GLOBAL_WINDOWS:
            # the allowlist covers ONLY the global-window finding; anything
            # else (e.g. a CartesianProduct creeping in) still flags
            allowed = [f for f in findings if f.endswith(GLOBAL_WINDOW)]
            findings = [f for f in findings if not f.endswith(GLOBAL_WINDOW)]
            if allowed:
                print(f"allow {name}: {ALLOWED_GLOBAL_WINDOWS[name]}")
        if name in ALLOWED_CARTESIAN:
            allowed = [f for f in findings if f.endswith("CartesianProduct")]
            findings = [f for f in findings if not f.endswith("CartesianProduct")]
            if allowed:
                print(f"allow {name}: {ALLOWED_CARTESIAN[name]}")
        if findings:
            print(f"FLAG  {name}: {'; '.join(findings)}")
            bad += 1
    print(f"done: {bad} flagged/errored")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
