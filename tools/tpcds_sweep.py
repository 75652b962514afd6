"""TPC-DS sweep regression tracker: run ``bench.py --tpcds`` (the timing
source of record), snapshot its per-query seconds into TPCDS_SWEEP.json
keyed by a round label, and flag round-over-round movers.

The driver's bench covers 3 TPC-DS representatives; the other 96 only get
correctness checks, so a plan regression in them is invisible between
rounds (r4 verdict item 5). This makes the full sweep a tracked series:
each run appends a labeled snapshot and prints any query whose time moved
more than THRESHOLD× against the previous snapshot (below a noise floor of
0.2 s, moves are ignored).

Usage: python tools/tpcds_sweep.py [--label r6] [--threshold 1.5]
       (sf dir via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
Exit code 1 when movers (or per-query errors) are found, so a round
close-out can gate on it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = os.path.join(REPO, "TPCDS_SWEEP.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default=None, help="snapshot label, e.g. r6")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    import bench

    times = bench.tpcds_sweep()
    total = round(sum(times.values()), 1)

    history = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            history = json.load(f)
    prev = history[-1] if history else None
    label = args.label or f"run{len(history) + 1}"
    history.append(
        {
            "label": label,
            "sf_dir": os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
            ),
            "total_sec": total,
            "n_queries": len(times),
            "times": times,
        }
    )
    with open(RESULTS, "w") as f:
        json.dump(history, f, indent=1, sort_keys=True)

    movers = []
    if prev:
        for name, sec in times.items():
            p = prev["times"].get(name)
            if p and p > 0.2 and sec > 0.2:
                ratio = sec / p
                if ratio > args.threshold or ratio < 1 / args.threshold:
                    movers.append((name, p, sec, round(ratio, 2)))
    movers.sort(key=lambda m: -abs(m[3] - 1))
    print(
        json.dumps(
            {
                "label": label,
                "total_sec": total,
                "n_queries": len(times),
                "vs_prev": prev["label"] if prev else None,
                "movers": [
                    {"query": n, "prev_sec": p, "now_sec": s, "ratio": r}
                    for n, p, s, r in movers
                ],
            }
        )
    )
    return 1 if movers else 0


if __name__ == "__main__":
    raise SystemExit(main())
