#!/usr/bin/env python
"""Runtime A/B harness -- the analog of the reference's runtime_test.sh +
analyze_runtimes.py loop: run the fixture workload through every planner
with N repetitions, verify cross-planner result agreement, write
allQueryRuntimes.json, and print the per-planner averages.

Usage:
  python scripts/runtime_test.py [--sf-dir DIR] [--reps N] [--out FILE]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_optimizer_spark.harness import run_query, write_runtimes
from query_optimizer_spark.oracle import TrueCountOracle
from query_optimizer_spark.session import get_session
from query_optimizer_spark.workload import FIXTURES

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_runtimes import analyze  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    # 3 reps: rep 1 pays the arm's one-time codegen compile (recorded,
    # visible), reps 2-3 are pure execution; analyze() reads the last
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="allQueryRuntimes.json")
    ap.add_argument("--timeout-s", type=float, default=1200.0)
    args = ap.parse_args()

    spark = get_session("runtime-test", profile="default")
    oracle = TrueCountOracle(args.sf_dir)
    records = []
    for name, sql in FIXTURES.items():
        rec = run_query(
            spark,
            args.sf_dir,
            name,
            sql,
            oracle,
            reps=args.reps,
            timeout_s=args.timeout_s,
        )
        ok = rec.verify_results()
        print(f"{name:18s} verified={ok} costs="
              f"{ {k: round(v, 1) for k, v in rec.costs.items()} }")
        if not ok:
            print(f"  HASH MISMATCH: {rec.result_hashes}")
        records.append(rec)
    write_runtimes(records, args.out)
    print(f"\nwrote {args.out}; per-planner mean of last rep:")
    import json

    with open(args.out) as f:
        for planner, ms in sorted(analyze(json.load(f)).items(), key=lambda kv: kv[1]):
            print(f"  {planner:18s} {ms:9.1f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
