"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names, and
an order-insensitive value hash. Stricter than the driver (exact value
comparison after normalization), so a pass here should imply a driver pass.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ytsaurus_spark.catalog import TABLE_NAMES
from ytsaurus_spark.queries import all_oracles, all_queries
from ytsaurus_spark.session import get_spark


def normalize_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Preserve the sign of zero: the driver's value hash is built from
        # exact reprs, so a DuckDB -0.0 vs Spark 0.0 IS a failure (caught
        # live by ql_sr_array_join in round 2). repr() distinguishes them.
        if v == 0:
            return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize_value(x)) for k, x in v.items()))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_value(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    if vanilla:
        # The driver-harness condition: a FOREIGN session with none of our
        # confs — the registry bootstrap (ensure_runtime_confs) must make
        # every query work on it. This mode is what would have caught
        # round 1's 0/50 (catalog assumed a pre-configured session).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
            )
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = all_queries(), all_oracles()
    names = [n for n in queries if not only or n in only]
    passed, failed = [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            failed.append((name, "SPARK ERROR:\n" + traceback.format_exc()))
            continue
        if name not in oracles:
            passed.append((name, f"rows-only: {len(s_rows)} rows", time.time() - t0))
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception:
            failed.append((name, "DUCKDB ERROR:\n" + traceback.format_exc()))
            continue
        sc, sr = canonical_rows(s_cols, s_rows)
        dc, dr = canonical_rows(d_cols, d_rows)
        if sc != dc:
            failed.append((name, f"column mismatch: spark={sc} duck={dc}"))
        elif len(sr) != len(dr):
            failed.append(
                (name, f"row count mismatch: spark={len(sr)} duck={len(dr)}")
            )
        elif sr != dr:
            diffs = [
                (a, b) for a, b in zip(sr, dr) if a != b
            ][:3]
            extra = f" first diffs: {diffs}" if diffs else " (ordering-level diff)"
            failed.append((name, f"value mismatch ({len(sr)} rows).{extra}"))
        else:
            passed.append((name, f"{len(sr)} rows", time.time() - t0))

    for name, info, dt in passed:
        print(f"PASS {name:32s} {info} [{dt:.1f}s]")
    for name, info in failed:
        print(f"FAIL {name:32s} {info}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, sf_dir={sf_dir}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
