"""YQL conformance sweep: try EVERY reference bench file
(yt/benchmarks/run/queries/*.sql) verbatim through the dialect shim on
both engines and report, per file:

- PASS     — strict row/column/value agreement (check_oracle's canonical
             compare: sorted rows, exact reprs) at the given sf
- SPARK/DUCK ERR — one engine rejects it (missing derivation column, a
             YQL builtin with no portable analog, ...)
- DIFF     — both run, values disagree (usually a nondeterministic LIMIT
             tie or a float-path divergence — NOT registrable)

The passing set is what queries/yql_q.py registers. Usage:
    python tools/yql_conformance.py [sf_dir] [qnum ...]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BENCH = "/root/reference/yt/benchmarks/run/queries"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> int:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else "/root/testdata/sf0.01")
    only = set(sys.argv[2:])

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_oracle import canonical_rows, strict_normalize

    from ytsaurus_spark.session import get_spark
    from ytsaurus_spark.yql import oracle_with_star, register_star_views
    from ytsaurus_spark.yql.dialect import translate_yql_script

    spark = get_spark("yql-conformance")
    s2 = register_star_views(spark.newSession(), sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    counts = {"PASS": [], "DIFF": [], "SPARK ERR": [], "DUCK ERR": [],
              "PARSE ERR": []}
    jobs: list[tuple[str, object]] = []
    for path in sorted(glob.glob(os.path.join(BENCH, "*.sql"))):
        qn = os.path.basename(path)[:-4]
        if only and qn not in only:
            continue
        text = open(path, encoding="utf-8").read()
        try:
            parts = translate_yql_script(text)
        except Exception as e:
            counts["PARSE ERR"].append(qn)
            print(f"{qn}: PARSE ERR {str(e)[:90]}", flush=True)
            continue
        if len(parts) == 1:
            jobs.append((qn, parts[0]))
        else:
            jobs.extend(
                (f"{qn}{chr(97 + i)}", p) for i, p in enumerate(parts)
            )

    for q, tq in jobs:
        t0 = time.time()
        try:
            cur = con.execute(oracle_with_star(tq.sql))
            d_cols = [d[0] for d in cur.description]
            d_raw = cur.fetchall()
        except Exception as e:
            counts["DUCK ERR"].append(q)
            print(f"{q}: DUCK ERR {str(e).splitlines()[0][:110]}",
                  flush=True)
            continue
        try:
            sdf = s2.sql(tq.sql)
            s_cols = sdf.columns
            s_raw = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            counts["SPARK ERR"].append(q)
            print(f"{q}: SPARK ERR {str(e).splitlines()[0][:110]}",
                  flush=True)
            continue
        sc, sr = canonical_rows(s_cols, s_raw, strict_normalize)
        dc, dr = canonical_rows(d_cols, d_raw, strict_normalize)
        if sc == dc and sr == dr:
            counts["PASS"].append(q)
            print(f"{q}: PASS {len(sr)} rows [{time.time()-t0:.1f}s]",
                  flush=True)
        else:
            counts["DIFF"].append(q)
            why = ("cols" if sc != dc else
                   f"rows {len(sr)} vs {len(dr)}" if len(sr) != len(dr)
                   else "values")
            print(f"{q}: DIFF ({why})", flush=True)
    for k, v in counts.items():
        print(f"{k}: {len(v)} {v}")
    if os.environ.get("YQL_CONFORMANCE_JSON"):
        import json

        path = os.environ["YQL_CONFORMANCE_JSON"]
        rec = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                rec = json.load(fh)
        # registry normalizations (queries/yql_q.py) close the raw DIFFs
        # the shared-text harness cannot: positional names (35/38/87),
        # the q58 oracle ORDER BY, and q90's double-grain compare
        rec[os.path.basename(sf_dir)] = {
            k: sorted(v) for k, v in counts.items()
        }
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
