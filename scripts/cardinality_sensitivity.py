#!/usr/bin/env python
"""Cardinality-sensitivity harness -- the experiment the reference exists
to run (startTestCardinalities, QueryOptExperiment.java:437-505): how much
does cardinality-estimation error degrade plan quality?

For every fixture query and several estimate sources (classic stats
estimator, deterministic x2/x8/x32 perturbations of truth), plan under the
estimate, re-cost that plan under TRUE cardinalities, and report the
ratio to the true optimum (1.0 = estimation error did not hurt).

Pure planning -- no SparkSession needed.

Usage: python scripts/cardinality_sensitivity.py [--sf-dir DIR] [--cost-model cm1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_optimizer_spark.costmodels import get_cost_model
from query_optimizer_spark.harness import compare_oracles
from query_optimizer_spark.joingraph import JoinGraph
from query_optimizer_spark.oracle import SparkStatsOracle, TrueCountOracle
from query_optimizer_spark.sqlparse import parse
from query_optimizer_spark.workload import FIXTURES, _base_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cost-model", default="cm1")
    ap.add_argument("--planner", default="dp_ccp")
    args = ap.parse_args()

    cm = get_cost_model(args.cost_model)
    true_oracle = TrueCountOracle(args.sf_dir)
    for sql in FIXTURES.values():
        true_oracle.precompute_all_connected(JoinGraph.from_query(parse(sql)))

    estimators = {
        "stats_estimator": SparkStatsOracle(_base_rows(args.sf_dir)),
        "perturb_x2": true_oracle.snapshot().perturbed(seed=1, max_factor=2),
        "perturb_x8": true_oracle.snapshot().perturbed(seed=1, max_factor=8),
        "perturb_x32": true_oracle.snapshot().perturbed(seed=1, max_factor=32),
    }

    header = f"{'query':18s}" + "".join(f"{n:>18s}" for n in estimators)
    print(f"cost-model={args.cost_model} planner={args.planner} "
          f"(ratio est-plan-true-cost / optimal-true-cost)")
    print(header)
    rows = {}
    for est_name, est in estimators.items():
        out = compare_oracles(
            FIXTURES, est, true_oracle, cost_model=cm, planner=args.planner
        )
        for q, (est_cost_true, opt_true) in out.items():
            rows.setdefault(q, {})[est_name] = est_cost_true / opt_true
    for q, ratios in rows.items():
        print(f"{q:18s}" + "".join(
            f"{ratios[n]:18.3f}" for n in estimators
        ))


if __name__ == "__main__":
    main()
