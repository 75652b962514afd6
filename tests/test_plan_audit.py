"""Whole-registry plan-shape gate: every registered query's physical plan
must be free of unpartitioned windows (single-task sort of the whole
input) and CartesianProduct operators — the two anti-patterns that pass
small-SF correctness but collapse at cluster scale. This is
tools/audit_plans.py wired into pytest (VERDICT r6 task 1): a red audit
now fails the suite instead of waiting for someone to run the tool.

Two allowlists, each scoped to ONE finding kind:
plans.ALLOWED_GLOBAL_WINDOWS for queries whose window input is dim-sized
by construction, and plans.ALLOWED_CARTESIAN for verbatim reference bench
text whose cross-join sides are dim-bounded at runtime but invisible to
pre-AQE size estimation (yql_q77). Engine-authored queries must never
need the cartesian list. Queries that execute work at plan-build time
(streaming drains, durable-commit pipelines) run sf0.001-sized work —
the sweep stays test-budget-sized.
"""

from __future__ import annotations

from ytsaurus_spark.plans import (
    ALLOWED_CARTESIAN,
    ALLOWED_GLOBAL_WINDOWS,
    plan_audit_findings,
)
from ytsaurus_spark.queries import all_queries


def test_registry_plan_audit(spark, sf_dir):
    failures = []
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            findings = plan_audit_findings(
                df,
                allow_global=name in ALLOWED_GLOBAL_WINDOWS,
                allow_cartesian=name in ALLOWED_CARTESIAN,
            )
        except Exception as e:  # noqa: BLE001 - collect, report all at once
            failures.append(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        if findings:
            failures.append(f"{name}: {'; '.join(findings)}")
    assert not failures, (
        "plan audit flagged queries (fix the plan or, for a dim-sized "
        "global window, add to plans.ALLOWED_GLOBAL_WINDOWS with the "
        "bounded-input contract):\n" + "\n".join(failures)
    )
