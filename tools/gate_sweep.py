"""Repeat-run discipline for the driver's 50-query gate window (round-4
verdict item 8): run the EXACT window (registry positions 0..49, which is
what the driver samples) N times, each in a FRESH python/JVM session, and
count per-query status/hash flips across runs.

Round 4's two driver reds were integer-only queries that were bit-identical
to DuckDB in every same-session retry — exactly the class that only a
fresh-session sweep of the window has a chance to surface locally.

    python tools/gate_sweep.py [--runs 10] [--first 50] [--out GATE_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, metavar="PATH")
    ap.add_argument(
        "-k",
        default=None,
        help="comma-separated name filters passed through to check_oracle "
        "— targeted fresh-session sweeps of specific queries (e.g. a "
        "post-sweep addition) instead of the window prefix",
    )
    args = ap.parse_args()

    tmpdir = tempfile.mkdtemp(prefix="gate_sweep_")
    runs: list[dict] = []
    for i in range(args.runs):
        path = os.path.join(tmpdir, f"run_{i}.json")
        cmd = [
            sys.executable,
            os.path.join(HERE, "check_oracle.py"),
            "--sf",
            args.sf,
            "--first",
            str(args.first),
            "--json",
            path,
        ]
        if args.k:
            cmd += ["-k", args.k]
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
        )
        if not os.path.exists(path):
            print(f"run {i}: check_oracle crashed rc={proc.returncode}")
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            return 2
        with open(path) as f:
            data = json.load(f)
        runs.append(data["queries"])
        n_fail = data["n_fail"]
        print(f"run {i}: {data['n_pass']}/{data['n_queries']} pass, {n_fail} fail")

    # Aggregate: per query, the set of observed (status, hash) outcomes.
    names = sorted({n for r in runs for n in r})
    flips: dict[str, dict] = {}
    stable_fail: list[str] = []
    for n in names:
        outcomes = [
            (r.get(n, {}).get("status", "MISSING"), r.get(n, {}).get("hash", ""))
            for r in runs
        ]
        distinct = sorted(set(outcomes))
        if len(distinct) > 1:
            flips[n] = {"outcomes": [list(d) for d in distinct]}
        elif distinct[0][0] != "PASS":
            stable_fail.append(n)

    summary = {
        "runs": args.runs,
        "window": args.first,
        "sf_dir": args.sf,
        "n_queries": len(names),
        # Which queries the sweep actually covered — without this the
        # artifact is indistinguishable across window rotations.
        "window_names": names,
        "flip_count": len(flips),
        "flips": flips,
        "stable_fail": stable_fail,
    }
    print(json.dumps({k: summary[k] for k in ("runs", "window", "flip_count", "stable_fail")}))
    if flips:
        print("FLIPS:", json.dumps(flips, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    return 1 if (flips or stable_fail) else 0


if __name__ == "__main__":
    sys.exit(main())
