"""Capture .explain("formatted") for bench HEADLINE queries (and any -k
extras) into plans/r12/<query>_<tag>.txt — the optimization round's
before/after plan evidence (guide §1: measure first; §7.2: read the plan).

Note: queries that eagerly pin their result (localCheckpoint — the sweep
family) or run plan-assertion side effects (bucketed join) execute real
work during plan construction; their final explain shows a Scan
ExistingRDD over the pinned result. For those, the interesting plan is
the upstream subtree, which test_plans.py guards separately; the capture
still records the executed shape (number of jobs is visible in the code).

    python tools/capture_plans.py --tag before [--sf /root/testdata/sf0.1] [-k name,name]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from app_insights_generator_spark.session import get_spark
from app_insights_generator_spark.queries import QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("-k", default=None, help="comma-separated query names (default: bench HEADLINE)")
    args = ap.parse_args()

    import bench

    names = args.k.split(",") if args.k else list(bench.HEADLINE)
    outdir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="capture-plans")
    for name in names:
        fn = QUERIES.get(name) or bench._EXTRA.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # record the failure instead of dying mid-list
            text = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
