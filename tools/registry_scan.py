"""Time every registered query once (sequential count()) at a given SF
dir — the round-11 whole-registry heavy-finder. Prints one line per query
(slowest last) and a JSON tail. Timing is cold-ish (one pass, no warm
run): use it to RANK, then re-measure candidates warm before/after.

Usage: python tools/registry_scan.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ytsaurus_spark.queries import all_queries
from ytsaurus_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/registry_scan.json"
    spark = get_spark("registry-scan")
    queries = all_queries()
    timings: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in sorted(queries):
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).count()
        except Exception as e:  # rank-only tool: record and move on
            errs[name] = repr(e)[:200]
        timings[name] = round(time.time() - t0, 3)
    for name, t in sorted(timings.items(), key=lambda kv: kv[1]):
        print(f"{t:8.3f}  {name}")
    total = round(sum(timings.values()), 3)
    print(f"TOTAL {total}s over {len(timings)} queries, {len(errs)} errors")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "total": total, "queries": timings,
                   "errors": errs}, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
