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

from query_optimizer_spark.agents import GreedyRewardAgent, run_episode
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

N_FEATS = 6


def action_features(env: JoinOrderEnv, state: dict, action: int) -> list[float]:
    """Features of one candidate join, computed from the state JSON the
    protocol exposes (§2.9) -- nothing env-internal."""
    verts = {v["id"]: v for v in state["vertices"]}
    if state["edges"]:
        va, vb = state["edges"][action]["factors"]
        n_attrs = len(state["edges"][action]["joinAttributes"])
    else:  # cross-join fallback over live vertices
        live = sorted(verts)
        va, vb = live[0], live[action + 1]
        n_attrs = 0
    ca = math.log10(1.0 + verts[va]["estimated_cardinality"])
    cb = math.log10(1.0 + verts[vb]["estimated_cardinality"])
    fa = len(verts[va]["factors"])
    fb = len(verts[vb]["factors"])
    return [
        1.0,
        min(ca, cb) / 6.0,
        max(ca, cb) / 6.0,
        (ca + cb) / 12.0,
        n_attrs / 4.0,
        (fa + fb) / 8.0,
    ]


class ReinforceAgent:
    """Linear softmax policy + episodic REINFORCE with batch-normalized
    returns (costs span orders of magnitude, so raw-return gradients
    explode; the advantage normalization is standard)."""

    def __init__(self, lr: float = 0.2, seed: int = 0, temp: float = 1.0):
        self.theta = [0.0] * N_FEATS
        self.lr = lr
        self.temp = temp
        self.rng = random.Random(seed)

    def _scores(self, env, state):
        feats = [
            action_features(env, state, a) for a in env.actions()
        ]
        scores = [
            sum(t * f for t, f in zip(self.theta, fv)) / self.temp
            for fv in feats
        ]
        m = max(scores)
        exps = [math.exp(s - m) for s in scores]
        z = sum(exps)
        return feats, [e / z for e in exps]

    def act_sample(self, env, state):
        feats, probs = self._scores(env, state)
        r = self.rng.random()
        acc = 0.0
        for a, p in enumerate(probs):
            acc += p
            if r <= acc:
                return a, feats, probs
        return len(probs) - 1, feats, probs

    def act_greedy(self, env: JoinOrderEnv) -> int:
        state = env.state()
        feats, probs = self._scores(env, state)
        return max(range(len(probs)), key=lambda a: probs[a])

    def play_episode(self, env: JoinOrderEnv):
        state = env.reset()
        steps = []  # (feats, probs, action)
        rewards = []
        while not env.done:
            a, feats, probs = self.act_sample(env, state)
            state, reward, _, _ = env.step(a)
            steps.append((feats, probs, a))
            # log-compress the step cost: returns then add like log-costs
            rewards.append(-math.log10(1.0 - reward))  # reward = -cost
        return steps, rewards, env.cost_so_far

    def update(self, batch):
        """batch: list of (steps, rewards) episodes."""
        # returns-to-go, normalized across the whole batch
        gs = []
        for steps, rewards in batch:
            g = 0.0
            ep = []
            for r in reversed(rewards):
                g += r
                ep.append(g)
            gs.append(list(reversed(ep)))
        flat = [g for ep in gs for g in ep]
        mean = sum(flat) / len(flat)
        var = sum((g - mean) ** 2 for g in flat) / max(len(flat) - 1, 1)
        sd = math.sqrt(var) or 1.0
        for (steps, _), ep_gs in zip(batch, gs):
            for (feats, probs, a), g in zip(steps, ep_gs):
                adv = -(g - mean) / sd  # lower summed log-cost is better
                # grad log pi(a) = f(a) - sum_b pi(b) f(b)
                mean_f = [
                    sum(p * fv[i] for p, fv in zip(probs, feats))
                    for i in range(N_FEATS)
                ]
                for i in range(N_FEATS):
                    self.theta[i] += (
                        self.lr * adv * (feats[a][i] - mean_f[i])
                    )


def greedy_cost(agent: ReinforceAgent, env: JoinOrderEnv) -> float:
    env.reset()
    while not env.done:
        env.step(agent.act_greedy(env))
    return env.cost_so_far


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--episodes", type=int, default=480)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="AGENT_TRAINING.md")
    args = ap.parse_args()

    oracle = stats_oracle(args.sf_dir)
    cm = get_cost_model("cm1")
    envs = {
        name: JoinOrderEnv(
            JoinGraph.from_query(parse(FIXTURES[name])), oracle, cm, seed=7
        )
        for name in TRAIN_FIXTURES
    }
    agent = ReinforceAgent(lr=0.2, seed=0)

    curve = []  # (episode, mean policy cost over fixtures, log10)
    batch = []
    order = list(TRAIN_FIXTURES)
    rng = random.Random(1)
    for ep in range(args.episodes):
        name = order[ep % len(order)]
        steps, rewards, _cost = agent.play_episode(envs[name])
        batch.append((steps, rewards))
        if len(batch) >= args.batch:
            agent.update(batch)
            batch = []
        if ep % 48 == 0 or ep == args.episodes - 1:
            mean_log = sum(
                math.log10(greedy_cost(agent, envs[n]))
                for n in TRAIN_FIXTURES
            ) / len(TRAIN_FIXTURES)
            curve.append((ep, round(mean_log, 4)))
            print(f"episode {ep:4d}: mean log10(policy cost) = {mean_log:.4f}",
                  flush=True)
        rng.shuffle(order) if ep % len(order) == len(order) - 1 else None

    # final comparison per fixture
    rows = []
    for name in TRAIN_FIXTURES:
        env = envs[name]
        pol = greedy_cost(agent, env)
        # random baseline: mean of 20 seeded random episodes
        rnd_costs = []
        r = random.Random(3)
        for _ in range(20):
            env.reset()
            while not env.done:
                env.step(r.choice(env.actions()))
            rnd_costs.append(env.cost_so_far)
        rnd = sum(rnd_costs) / len(rnd_costs)
        grd = run_episode(env, GreedyRewardAgent())["cost"]
        graph = envs[name].graph
        opt = PLANNERS["dp_ccp"](graph, oracle, cm).cost
        rows.append((name, pol, rnd, grd, opt))

    lines = [
        "# AGENT_TRAINING -- learned join-order policy (J7 / §2.9)",
        "",
        f"REINFORCE, linear softmax over {N_FEATS} features computed from",
        "the protocol-observable state JSON only (vertex estimated",
        "cardinality / factor counts, edge join-attribute count), so the",
        "agent runs unchanged against the wire front-end.  Deterministic",
        f"seeds; {args.episodes} episodes round-robin over"
        f" {len(TRAIN_FIXTURES)} fixtures; batch {args.batch};"
        " stats-oracle estimates (the realistic deployment input).",
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
    for name, pol, rnd, grd, opt in rows:
        lines.append(
            f"| {name} | {pol:.3g} | {rnd:.3g} | {grd:.3g} | {opt:.3g} |"
        )
    gm = lambda vals: math.exp(sum(math.log(v) for v in vals) / len(vals))  # noqa: E731
    pol_over_opt = gm([p / o for _, p, _, _, o in rows])
    rnd_over_opt = gm([r / o for _, _, r, _, o in rows])
    lines += [
        "",
        f"Geomean policy/optimal = **{pol_over_opt:.2f}**, random/optimal ="
        f" **{rnd_over_opt:.2f}** -- the learned policy closes"
        f" {100 * (1 - math.log(pol_over_opt) / math.log(rnd_over_opt)):.0f}%"
        " of the random-to-optimal gap (in log space).",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
