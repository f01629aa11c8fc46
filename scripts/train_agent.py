#!/usr/bin/env python
"""Train a learned join-order policy over JoinOrderEnv (J7 / §2.9).

The reference is an RL research harness whose Python agent side is
absent from its snapshot (SURVEY.md: "the agent side must be
reconstructed from the ZMQ protocol").  The scripted agents in
``agents.py`` prove the env loop; this script closes the remaining gap
with an actual LEARNING agent: episodic REINFORCE over a linear
softmax policy whose features come ONLY from the protocol-observable
state JSON (vertex ``estimated_cardinality`` / ``factors``, edge
``joinAttributes`` -- §2.9 exactly), so the same agent ports to the
wire front-end (`park_server.ParkClient`) unchanged.

Deterministic (seeded); pure planning, no SparkSession.  Writes
AGENT_TRAINING.md with the learning curve and a final comparison
against random / greedy-by-reward / the DPccp optimum.

Usage: python scripts/train_agent.py [--episodes 400] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_optimizer_spark.agents import (
    N_FEATS,
    GreedyRewardAgent,
    ReinforceAgent,
    run_episode,
)
from query_optimizer_spark.costmodels import get_cost_model
from query_optimizer_spark.env import JoinOrderEnv
from query_optimizer_spark.joingraph import JoinGraph
from query_optimizer_spark.planners import PLANNERS
from query_optimizer_spark.sqlparse import parse
from query_optimizer_spark.workload import FIXTURES, stats_oracle

TRAIN_FIXTURES = [
    "join_chain_3",
    "join_star_4",
    "join_cycle_7",
    "join_preds_3",
    "join_events_8",
    "join_group_3",
    "join_selfjoin_4",
    "join_galaxy_10",
]

def greedy_cost(agent: ReinforceAgent, env: JoinOrderEnv, cm, oracle) -> float:
    """Cumulative cm1 cost (INCLUDING leaf scans, like PlanResult.cost)
    of the plan the greedy-argmax policy builds.  The env's
    ``cost_so_far`` sums only join-node costs; planner costs add the
    plan-invariant leaf-scan terms, so every number in the artifact is
    computed with ``cm.cumulative`` over the finished tree to be
    directly comparable with dp_ccp's optimum."""
    env.reset()
    while not env.done:
        env.step(agent.act(env))
    return cm.cumulative(env.graph, env.final_plan(), oracle)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--episodes", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--temp", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--holdout",
        default="join_events_8,join_galaxy_10",
        help="comma-separated fixtures NEVER trained on, evaluated "
        "zero-shot (the generalization claim; '' disables)",
    )
    ap.add_argument("--out", default="AGENT_TRAINING.md")
    ap.add_argument(
        "--save-policy",
        default="POLICY.json",
        help="write the best-eval checkpoint weights here ('' disables)",
    )
    args = ap.parse_args()

    oracle = stats_oracle(args.sf_dir)
    cm = get_cost_model("cm1")
    envs = {
        name: JoinOrderEnv(
            JoinGraph.from_query(parse(FIXTURES[name])), oracle, cm, seed=7
        )
        for name in TRAIN_FIXTURES
    }
    holdout = {n for n in args.holdout.split(",") if n}
    train_names = [n for n in TRAIN_FIXTURES if n not in holdout]
    agent = ReinforceAgent(lr=args.lr, seed=args.seed, temp=args.temp)
    best_eval: tuple[float, list[float]] | None = None  # checkpoint argmax-eval

    curve = []  # (episode, mean policy cost over TRAIN fixtures, log10)
    batch = []
    order = list(train_names)
    rng = random.Random(1)
    for ep in range(args.episodes):
        name = order[ep % len(order)]
        steps, rewards, _cost = agent.play_episode(envs[name])
        batch.append((name, steps, rewards))
        if len(batch) >= args.batch:
            agent.update(batch)
            batch = []
        if ep % 96 == 0 or ep == args.episodes - 1:
            mean_log = sum(
                math.log10(greedy_cost(agent, envs[n], cm, oracle))
                for n in train_names
            ) / len(train_names)
            curve.append((ep, round(mean_log, 4)))
            if best_eval is None or mean_log < best_eval[0]:
                best_eval = (mean_log, list(agent.theta))
            print(f"episode {ep:4d}: mean log10(policy cost) = {mean_log:.4f}",
                  flush=True)
        rng.shuffle(order) if ep % len(order) == len(order) - 1 else None

    # final comparison per fixture, with the best-eval checkpoint
    # (standard early stopping: REINFORCE keeps exploring after the
    # argmax policy has peaked, so the last iterate may be worse)
    if best_eval is not None:
        agent.theta = best_eval[1]
    rows = []
    for name in TRAIN_FIXTURES:
        env = envs[name]
        pol = greedy_cost(agent, env, cm, oracle)
        # random baseline: mean of 20 seeded random episodes
        rnd_costs = []
        r = random.Random(3)
        for _ in range(20):
            env.reset()
            while not env.done:
                env.step(r.choice(env.actions()))
            rnd_costs.append(cm.cumulative(env.graph, env.final_plan(), oracle))
        rnd = sum(rnd_costs) / len(rnd_costs)
        run_episode(env, GreedyRewardAgent())
        grd = cm.cumulative(env.graph, env.final_plan(), oracle)
        graph = envs[name].graph
        opt = PLANNERS["dp_ccp"](graph, oracle, cm).cost
        rows.append((name, pol, rnd, grd, opt, name in holdout))

    lines = [
        "# AGENT_TRAINING -- learned join-order policy (J7 / §2.9)",
        "",
        f"REINFORCE, linear softmax over {N_FEATS} features computed from",
        "the protocol-observable state JSON only (vertex estimated",
        "cardinality / factor counts, edge join-attribute count), so the",
        "agent runs unchanged against the wire front-end.  Deterministic",
        f"seeds; {args.episodes} episodes round-robin over"
        f" {len(train_names)} fixtures; batch {args.batch};"
        " stats-oracle estimates (the realistic deployment input)."
        + (
            f"  Held out from training, evaluated ZERO-SHOT: "
            f"{', '.join(sorted(holdout))} (marked * below)."
            if holdout
            else ""
        ),
        "",
        "## Learning curve (greedy-policy eval)",
        "",
        "| episode | mean log10(plan cost) |",
        "|---|---|",
    ]
    lines += [f"| {ep} | {ml} |" for ep, ml in curve]
    lines += [
        "",
        "## Final policy vs baselines (cumulative cm1 cost, stats oracle)",
        "",
        "| fixture | learned policy | random (mean/20) | greedy-by-reward | dp_ccp optimum |",
        "|---|---|---|---|---|",
    ]
    for name, pol, rnd, grd, opt, held in rows:
        star = " *" if held else ""
        lines.append(
            f"| {name}{star} | {pol:.3g} | {rnd:.3g} | {grd:.3g} | {opt:.3g} |"
        )
    gm = lambda vals: math.exp(sum(math.log(v) for v in vals) / len(vals))  # noqa: E731

    def gap_line(label: str, subset) -> str:
        pol_over_opt = gm([p / o for _, p, _, _, o, _ in subset])
        rnd_over_opt = gm([r / o for _, _, r, _, o, _ in subset])
        closed = 100 * (
            1 - math.log(pol_over_opt) / math.log(rnd_over_opt)
        )
        return (
            f"{label}: geomean policy/optimal = **{pol_over_opt:.2f}**,"
            f" random/optimal = **{rnd_over_opt:.2f}** -- the policy closes"
            f" {closed:.0f}% of the random-to-optimal gap (log space)."
        )

    lines.append("")
    lines.append(gap_line("All fixtures", rows))
    if holdout:
        lines.append("")
        lines.append(
            gap_line(
                "Held-out (zero-shot)", [r for r in rows if r[5]]
            )
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    if args.save_policy:
        import json as _json

        Path(args.save_policy).write_text(
            _json.dumps(
                {
                    "theta": [round(t, 10) for t in agent.theta],
                    "n_feats": len(agent.theta),
                    "features": [
                        "bias", "min_logcard/6", "max_logcard/6",
                        "sum_logcard/12", "n_join_attrs/4", "n_factors/8",
                        "rank_min", "rank_max", "rank_sum",
                    ],
                    "trained_on": train_names,
                    "holdout": sorted(holdout),
                    "episodes": args.episodes,
                    "objective": "episodic REINFORCE, per-fixture baseline,"
                    " -sum(log10(1+step cm1 cost))",
                },
                indent=1,
            )
            + "\n"
        )
        print(f"wrote {args.save_policy}")


if __name__ == "__main__":
    main()
