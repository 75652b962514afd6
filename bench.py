"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = one representative per operator family (scan/agg/join/window/
mapreduce/dedup/similarity/streaming) — the queries whose plans matter most
at 100 TB. Each timing includes full plan execution (count() action) but not
session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ytsaurus_spark.queries import all_queries
from ytsaurus_spark.session import get_spark

HEADLINE = [
    "ql_group_agg",          # TPC-H Q1 shape: scan + 8 aggs
    "ql_join_inner",         # 5-table star join with broadcast dims
    "ql_order_limit",        # distributed top-k
    "win_topk_per_group",    # window shuffle
    "op_reduce",             # sorted-reduce (Arrow-batched user code)
    "op_map_reduce",         # mapInPandas + partial-agg combiner
    "dedup_minhash_lsh",     # wide minhash signatures + LSH band join
    "dedup_exact",           # hash groupBy over documents
    "sim_cosine_topk",       # brute-force vector math (HOF exprs)
    "sim_ann_lsh_topk",      # LSH-bucketed ANN path
    "sim_ivf_topk",          # IVF-cell ANN path
    "text_quality",          # string/array scan ops
    "stream_tumbling",       # windowed time agg
    "win_sessionize",        # lag/cumsum sessionization
    "agg_cube",              # multi-grouping aggregation
    "tpch_q3_shipping_priority",  # 3-table join + group + top-k
    "tpch_q7_nation_volume",      # fact-fact join, 6 tables
    "pipeline_clean_corpus",      # full dedup+quality pipeline
    "match_recognize_funnel",     # sequence pattern matching
    "stream_incremental_agg",     # queue pulls + keyed-table folds
    # added round 2 (baselines recorded in BASELINE.md at their r02 values)
    "dedup_embedding_cosine",     # hyperplane-bucketed semantic near-dup
    "tpch_q8_market_share",       # 8-table join, conditional-share agg
    "stream_match_recognize",     # stateful streaming pattern matching
    "dyn_mvcc_timestamped_read",  # log-structured MVCC reads + history
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    queries = all_queries()

    # warm the JVM + file-listing caches outside the timed region (cold
    # session startup is not a per-query cost at steady state)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        # warm the file listing/footer cache out of the timed region the same
        # way for every query: build the plan first, then execute.
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
