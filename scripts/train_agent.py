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

N_FEATS = 9


def _rank(vals: list[float]) -> list[float]:
    """Rank in [0,1] of each value within the candidate set (ties share
    the lower rank).  Rank-relative features transfer across fixtures
    whose absolute cardinalities differ by orders of magnitude -- the
    absolute-feature policy plateaued because 'log-card 4.2' is a big
    vertex in one fixture and a small one in another."""
    if len(vals) <= 1:
        return [0.0] * len(vals)
    order = sorted(vals)
    n = len(vals) - 1
    return [order.index(v) / n for v in vals]


def action_features(env: JoinOrderEnv, state: dict) -> list[list[float]]:
    """Feature vectors for ALL candidate actions, computed from the
    state JSON the protocol exposes (§2.9) -- nothing env-internal.
    Mix of absolute (scaled log-card) and rank-relative features."""
    verts = {v["id"]: v for v in state["vertices"]}
    raws = []
    n_actions = len(env.actions())
    for action in range(n_actions):
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
        raws.append((min(ca, cb), max(ca, cb), ca + cb, n_attrs, fa + fb))
    rk_min = _rank([r[0] for r in raws])
    rk_max = _rank([r[1] for r in raws])
    rk_sum = _rank([r[2] for r in raws])
    feats = []
    for i, (mn, mx, sm, n_attrs, f) in enumerate(raws):
        feats.append(
            [
                1.0,
                mn / 6.0,
                mx / 6.0,
                sm / 12.0,
                n_attrs / 4.0,
                f / 8.0,
                rk_min[i],
                rk_max[i],
                rk_sum[i],
            ]
        )
    return feats


class ReinforceAgent:
    """Linear softmax policy + episodic REINFORCE with batch-normalized
    returns (costs span orders of magnitude, so raw-return gradients
    explode; the advantage normalization is standard)."""

    def __init__(self, lr: float = 0.2, seed: int = 0, temp: float = 1.0):
        self.theta = [0.0] * N_FEATS
        self.lr = lr
        self.temp = temp
        self.rng = random.Random(seed)
        # per-fixture running baseline of episode return (mean, var, n):
        # fixtures differ by orders of magnitude in cost, so a shared
        # batch normalization makes the advantage encode fixture
        # identity instead of action quality (the r5 flat-curve bug)
        self.base: dict[str, tuple[float, float, int]] = {}

    def _advantage(self, name: str, ret: float) -> float:
        mean, var, n = self.base.get(name, (ret, 1.0, 0))
        sd = math.sqrt(var) if n > 1 else 1.0
        # ret = -sum(log10(1+step_cost)): HIGHER is better, so the
        # standard (return - baseline) advantage rewards cheap plans
        adv = (ret - mean) / max(sd, 1e-3)
        # EMA update of the per-fixture baseline
        alpha = 0.1
        if n == 0:
            self.base[name] = (ret, 1.0, 1)
        else:
            d = ret - mean
            self.base[name] = (
                mean + alpha * d,
                (1 - alpha) * (var + alpha * d * d),
                n + 1,
            )
        return max(-3.0, min(3.0, adv))

    def _scores(self, env, state):
        feats = action_features(env, state)
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
        """batch: list of (fixture_name, steps, rewards) episodes.

        Episode-level REINFORCE: one advantage per episode against the
        PER-FIXTURE running baseline (see ``_advantage``), applied to
        every step's log-policy gradient."""
        for name, steps, rewards in batch:
            adv = self._advantage(name, sum(rewards))
            for feats, probs, a in steps:
                # grad log pi(a) = f(a) - sum_b pi(b) f(b)
                mean_f = [
                    sum(p * fv[i] for p, fv in zip(probs, feats))
                    for i in range(N_FEATS)
                ]
                for i in range(N_FEATS):
                    self.theta[i] += (
                        self.lr * adv * (feats[a][i] - mean_f[i])
                    )


def greedy_cost(agent: ReinforceAgent, env: JoinOrderEnv, cm, oracle) -> float:
    """Cumulative cm1 cost (INCLUDING leaf scans, like PlanResult.cost)
    of the plan the greedy-argmax policy builds.  The env's
    ``cost_so_far`` sums only join-node costs; planner costs add the
    plan-invariant leaf-scan terms, so every number in the artifact is
    computed with ``cm.cumulative`` over the finished tree to be
    directly comparable with dp_ccp's optimum."""
    env.reset()
    while not env.done:
        env.step(agent.act_greedy(env))
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


if __name__ == "__main__":
    main()
