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

#: Per-query SF overrides (VERDICT r09 item 3): queries whose VALUE at the
#: sweep's default SF is a deliberate worst-case comparison point, not new
#: robustness signal. `insights_sweep_lineitem_wide_cube` is the exhaustive
#: 2^sets CUBE kept as the measured denominator for the Apriori mode (its
#: docstring says exactly that); at sf0.1 it alone cost 331 of the r09
#: sweep's 1,026 s. Running IT at sf0.01 keeps the execution check while
#: keeping the whole-registry sweep cheap enough to run every round. The
#: override is recorded per-row in the artifact (sf_override) so a reader
#: can never mistake the row for a default-SF run.
SF_OVERRIDES: dict[str, str] = {
    "insights_sweep_lineitem_wide_cube": "/root/testdata/sf0.01",
    # VERDICT r10 item 4: the four documented bounded truth-anchor
    # oracles (exact O(n^2) comparison points for the banded/IVF gates —
    # never production paths) were 37% of SCALE_SPARK_r10's wall. Their
    # robustness signal does not grow with SF; their cost does,
    # quadratically. Rows carry sf_override like the wide cube.
    "knn_label_accuracy_embeddings": "/root/testdata/sf0.01",
    "dedup_embedding_cosine_embeddings": "/root/testdata/sf0.01",
    "similarity_join_lsh_embeddings": "/root/testdata/sf0.01",
    "oracle_exact_cosine_pairs": "/root/testdata/sf0.01",
    # VERDICT r11 item 2: the two index-lifecycle GATES were 15% of
    # SCALE_SPARK_r11's wall (80.4s + 39.0s). The cost is the gate's
    # in-query full fit+persist+refresh (4 subspace codebooks via the
    # engine-exact Lloyd recurrence every run), not the operator — the
    # serving paths stay benched at sf0.1 in bench.py (ann_probe_persisted
    # 0.58s, pq_incremental_encode 0.63s calibrated). Their gate tier is
    # sf0.01 anyway (ORACLE_TIERS), so the sweep runs them there too.
    "pq_incremental_codes_embeddings": "/root/testdata/sf0.01",
    "ann_incremental_probe_embeddings": "/root/testdata/sf0.01",
    # Round 12: the compaction-lifecycle and PQ refit-decision gates are
    # the same class — their cost is the in-query fit + persist +
    # refresh lifecycle, not the serving path.
    "ivf_compaction_probe_embeddings": "/root/testdata/sf0.01",
    "pq_refit_decision_embeddings": "/root/testdata/sf0.01",
    "ivf_compaction_receipt_embeddings": "/root/testdata/sf0.01",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, metavar="PATH")
    ap.add_argument(
        "-k", default=None, help="comma-separated substring filters (OR-ed)"
    )
    ap.add_argument(
        "--no-overrides",
        action="store_true",
        help="ignore SF_OVERRIDES and run everything at --sf",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="spark-scale-sweep")
    # Warmup: absorb one-time JVM/codegen/shuffle startup so the FIRST
    # queries in registry order don't eat it (round-11 lesson: the gate
    # rotation moved the incremental ANN/PQ gates to positions 1-3 and
    # their per-query seconds read 2.5x worse than r10 purely from
    # cold-start — the artifact's cross-round comparisons need the same
    # steady state bench.py's warmup gives).
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    out: dict[str, dict] = {}
    fails = 0
    for name, fn in QUERIES.items():
        if args.k and not any(p in name for p in args.k.split(",")):
            continue
        sf_dir = args.sf
        if not args.no_overrides and name in SF_OVERRIDES:
            sf_dir = SF_OVERRIDES[name]
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            out[name] = {
                "status": "OK",
                "rows": n,
                "sec": round(time.time() - t0, 2),
            }
            if sf_dir != args.sf:
                out[name]["sf_override"] = sf_dir
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
