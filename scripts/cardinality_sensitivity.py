#!/usr/bin/env python
"""Cardinality-sensitivity harness -- the experiment the reference exists
to run (startTestCardinalities, QueryOptExperiment.java:437-505): how much
does cardinality-estimation error degrade plan quality?

For every fixture query, every estimation RUNG of the est-vs-true ladder
(C11: classic stats estimator -> Bernoulli sampling -> HLL sketches ->
deterministic perturbations of truth -> truth itself), and every
deterministic planner, plan under the estimate, re-cost that plan under
TRUE cardinalities, and report the ratio to the true optimum computed by
the same planner (1.0 = estimation error did not hurt that planner).
This is the per-round artifact the reference's
getEstCardinalityCosts/getOptCardinalityCosts pair records
(QueryOptExperiment.java:437-505).

Pure planning -- no SparkSession needed.

Usage: python scripts/cardinality_sensitivity.py [--sf-dir DIR]
           [--cost-model cm1] [--json CARDSENS_rNN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_optimizer_spark.costmodels import get_cost_model
from query_optimizer_spark.joingraph import JoinGraph
from query_optimizer_spark.oracle import (
    SampledCountOracle,
    SketchOracle,
    SparkStatsOracle,
    TrueCountOracle,
)
from query_optimizer_spark.planners import PLANNERS
from query_optimizer_spark.sqlparse import parse
from query_optimizer_spark.workload import FIXTURES, _base_rows

# every deterministic search strategy (random excluded: its plan depends
# on the seed, not the estimates, so est-vs-true is meaningless there)
PLANNER_NAMES = [
    "greedy",
    "left_deep",
    "bushy",
    "branch_and_bound",
    "dp_ccp",
    "ikkbz",
    "reinforce",
    "reinforce_pretrained",
]


def _plan(planner: str, graph, oracle, cm):
    """Plan with fallback to dp_ccp, mirroring run_fixture (IKKBZ
    declines cyclic graphs, branch_and_bound declines >12 edges)."""
    res = PLANNERS[planner](graph, oracle, cm)
    return res if res is not None else PLANNERS["dp_ccp"](graph, oracle, cm)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cost-model", default="cm1")
    ap.add_argument("--json", default=None, help="write full results here")
    args = ap.parse_args()

    cm = get_cost_model(args.cost_model)
    true_oracle = TrueCountOracle(args.sf_dir)
    graphs = {}
    for name, sql in FIXTURES.items():
        graphs[name] = JoinGraph.from_query(parse(sql))
        true_oracle.precompute_all_connected(graphs[name])

    rungs = {
        "stats_estimator": SparkStatsOracle(_base_rows(args.sf_dir)),
        "sampled_p20": SampledCountOracle(args.sf_dir, p=0.2),
        "sketch_hll": SketchOracle(args.sf_dir),
        "perturb_x8": true_oracle.snapshot().perturbed(seed=1, max_factor=8),
        "true": true_oracle,
    }

    results: dict[str, dict[str, dict[str, dict[str, float]]]] = {}
    for rung_name, est in rungs.items():
        per_planner: dict[str, dict[str, dict[str, float]]] = {}
        for planner in PLANNER_NAMES:
            per_q = {}
            for qname, graph in graphs.items():
                est_plan = _plan(planner, graph, est, cm)
                opt_plan = _plan(planner, graph, true_oracle, cm)
                est_cost_true = cm.cumulative(graph, est_plan.tree, true_oracle)
                per_q[qname] = {
                    "est_cost_true": est_cost_true,
                    "opt_true": opt_plan.cost,
                    "ratio": est_cost_true / opt_plan.cost if opt_plan.cost else 1.0,
                }
            per_planner[planner] = per_q
        results[rung_name] = per_planner

    # console summary: per rung x planner, geometric-mean ratio
    print(f"cost-model={args.cost_model} sf={args.sf_dir}")
    print(f"{'rung':18s}" + "".join(f"{p:>18s}" for p in PLANNER_NAMES))
    import math

    for rung_name, per_planner in results.items():
        cells = []
        for planner in PLANNER_NAMES:
            ratios = [v["ratio"] for v in per_planner[planner].values()]
            gm = math.exp(sum(math.log(max(r, 1e-12)) for r in ratios) / len(ratios))
            cells.append(f"{gm:18.3f}")
        print(f"{rung_name:18s}" + "".join(cells))

    if args.json:
        payload = {
            "sf_dir": args.sf_dir,
            "cost_model": args.cost_model,
            "planners": PLANNER_NAMES,
            "queries": list(FIXTURES),
            "rungs": results,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
