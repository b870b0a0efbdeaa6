"""All-registry Spark-side robustness sweep at an arbitrary SF.

Runs EVERY registered query end-to-end on Spark (no DuckDB oracle — the
plan, its assertions, and row production are the claim) and records
per-query status/rows/seconds as JSON. This is the instrument that
complements the value gate: check_oracle proves VALUES at the tier the
oracle can reach; this proves the Spark side EXECUTES everywhere.

It also exercises a different consumer than both the driver (collect)
and bench (noop sink): ``df.count()``. That difference is load-bearing —
the round-9 run caught Spark 4.1's ColumnPruning pushing below cogroup
UDFs under cardinality-only plans (operators/cogroup.py
``_pruned_error_ts``), a crash neither the value gate nor bench could
ever see.

    python tools/spark_scale_sweep.py [--sf /root/testdata/sf0.1] \
        [--out SCALE_SPARK.json] [-k substr,substr]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from app_insights_generator_spark.session import get_spark
from app_insights_generator_spark.queries import QUERIES


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, metavar="PATH")
    ap.add_argument(
        "-k", default=None, help="comma-separated substring filters (OR-ed)"
    )
    args = ap.parse_args()

    spark = get_spark(app_name="spark-scale-sweep")
    out: dict[str, dict] = {}
    fails = 0
    for name, fn in QUERIES.items():
        if args.k and not any(p in name for p in args.k.split(",")):
            continue
        t0 = time.time()
        try:
            n = fn(spark, args.sf).count()
            out[name] = {
                "status": "OK",
                "rows": n,
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            out[name] = {
                "status": "FAIL",
                "err": str(e)[:300],
                "sec": round(time.time() - t0, 2),
            }
            fails += 1
            print(f"FAIL {name}: {str(e)[:200]}", flush=True)
    summary = {
        "sf_dir": args.sf,
        "n_queries": len(out),
        "n_ok": sum(1 for v in out.values() if v["status"] == "OK"),
        "n_fail": fails,
        "total_sec": round(sum(v["sec"] for v in out.values()), 1),
        "slowest": sorted(
            ((v["sec"], k) for k, v in out.items()), reverse=True
        )[:10],
        "queries": out,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    print(
        json.dumps(
            {k: summary[k] for k in ("n_queries", "n_ok", "n_fail", "total_sec")}
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
