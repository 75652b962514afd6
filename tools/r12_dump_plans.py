"""Dump .explain('formatted') for headline (or named) queries to
plans/r12/<query>_<tag>.txt — the optimization round's before/after plan
evidence.

Usage: python tools/r11_dump_plans.py <before|after> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ytsaurus_spark.plans import formatted_plan  # noqa: E402
from ytsaurus_spark.queries import all_queries  # noqa: E402
from ytsaurus_spark.session import get_spark  # noqa: E402

# Queries whose implementation runs the computation inside the function
# (lifecycle scenarios materializing via collect) — explain() of the
# returned frame would re-run the scenario and show only the trivial
# localtable plan; skip the dump for those.
LIFECYCLE = {
    "stream_match_recognize",
    "dyn_mvcc_timestamped_read",
    "stream_incremental_agg",
    "stream_tumbling",
    "dyn_merge_into",
    "match_recognize_funnel",
}


def main() -> None:
    tag = sys.argv[1]
    from bench import HEADLINE

    names = sys.argv[2:] or [q for q in HEADLINE]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r11-plans")
    queries = all_queries()
    for name in names:
        if name in LIFECYCLE and name not in sys.argv[2:]:
            continue
        try:
            df = queries[name](spark, sf_dir)
            txt = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {e}"
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(txt + "\n")
        print("wrote", p)
    spark.stop()


if __name__ == "__main__":
    main()
