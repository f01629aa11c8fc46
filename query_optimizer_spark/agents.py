"""Scripted agents over JoinOrderEnv -- the reconstructed 'learning half'.

The reference's Python RL agent is absent from its snapshot (SURVEY.md:
"the agent side must be reconstructed from the ZMQ protocol").  These
scripted agents prove the environment loop end-to-end and provide the
baselines a learned policy is measured against:

- RandomAgent      : uniform action choice (the reference's
                     finish-on-reset behavior, RLJoinOrderRule.java:167-171).
- GreedyRewardAgent: one-step lookahead -- pick the action with the best
                     immediate reward (cost of the join just made, C10).
                     This is exactly 'greedy by reward' from SURVEY §7
                     build-plan step 5.
"""

from __future__ import annotations

import random

from .env import JoinOrderEnv
from .joingraph import make_join


class RandomAgent:
    def __init__(self, seed: int = 0):
        self.rng = random.Random(seed)

    def act(self, env: JoinOrderEnv) -> int:
        return self.rng.choice(env.actions())


class GreedyRewardAgent:
    """Chooses the action whose immediate join cost is lowest (peeking
    through the env's own cost model -- the in-process analog of an agent
    that queries getJoinsCost per action)."""

    def act(self, env: JoinOrderEnv) -> int:
        best_a, best_cost = None, None
        for a in env.actions():
            if env.live_edges:
                va, vb = env.live_edges[a]
            else:
                live = env._live_ids()
                va, vb = live[0], live[a + 1]
            join = make_join(
                env.graph, env.vertices[va].node, env.vertices[vb].node
            )
            cost = env.cm.node_cost(env.graph, join, env.oracle)
            if best_cost is None or cost < best_cost:
                best_a, best_cost = a, cost
        return best_a


def run_episode(env: JoinOrderEnv, agent) -> dict:
    """Play one episode to completion; returns the episode record."""
    env.reset()
    rewards = []
    while not env.done:
        _, reward, _, info = env.step(agent.act(env))
        rewards.append(reward)
    return {
        "total_reward": sum(rewards),
        "cost": env.cost_so_far,
        "n_steps": len(rewards),
        "plan": env.final_plan(),
        "order": env.final_plan().order_str(),
    }
