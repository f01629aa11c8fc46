"""Pluggable cost models over a cardinality oracle.

Replaces the reference's custom metadata cost methods
(``MyMetadataQuery.java:164-253``) and scalar-comparable cost vector
(``MyCostFactory.java:54-115`` -- 4 components but all comparisons use the
scalar ``cost``; we therefore use plain floats, SURVEY.md §1.1).

Models (SURVEY §2.7):
- ``cm1`` (default ''): C_out -- cost == rowCount per node, cumulative
  (MyCost ctor sets cost=rowCount, MyCostFactory.java:64-69).
- ``mm``: join = min(hash, index-NLJ); hash = |L|+|R| (build+probe, output
  not charged -- pipelining comment MyMetadataQuery.java:171-174); index-NLJ
  = 2|L|, eligible only when the right side is a single base table
  (:181-196, :210-226); scan = scan_cost_factor * rows (:204-234).
- ``cm2``: memory-aware (M = 1e6 rows, :57): in-memory -> |out| (the
  factory's default cost=rowCount); one-pass grace -> 2(|L|+|R|)+|out|;
  partitioned -> |R| + ceil(|R|/M)*|L| + |out| (:235-253).

All models charge leaf scans ``scan_cost_factor * filtered_rows``
(-scanCostFactor CLI knob, Main.java:61, default 1.0) so cumulative costs
are comparable across models.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .joingraph import Join, JoinGraph, Leaf, PlanNode


@dataclass
class CostModel:
    name: str = "cm1"
    scan_cost_factor: float = 1.0
    use_index_nlj: bool = True      # -useIndexNestedLJ, Main.java:74
    memory_limit: float = 1e6       # CM2 M, MyMetadataQuery.java:57

    def node_cost(self, graph: JoinGraph, node: PlanNode, oracle) -> float:
        """Non-cumulative cost of one plan node."""
        if isinstance(node, Leaf):
            return self.scan_cost_factor * oracle.card(graph, node.factors)
        left = oracle.card(graph, node.left.factors)
        right = oracle.card(graph, node.right.factors)
        out = oracle.card(graph, node.factors)
        if self.name == "cm1":
            return out
        if self.name == "mm":
            hash_cost = left + right
            if self.use_index_nlj and isinstance(node.right, Leaf):
                return min(hash_cost, 2.0 * left)
            return hash_cost
        if self.name == "cm2":
            m = self.memory_limit
            if left + right < m:
                return out
            if min(left, right) < m:
                return 2.0 * (left + right) + out
            return right + math.ceil(right / m) * left + out
        raise ValueError(f"unknown cost model {self.name!r}")

    def cumulative(self, graph: JoinGraph, node: PlanNode, oracle) -> float:
        """Cumulative plan cost (getCumulativeCost analog,
        QueryOptExperiment.computeCost :585-587)."""
        total = self.node_cost(graph, node, oracle)
        if isinstance(node, Join):
            total += self.cumulative(graph, node.left, oracle)
            total += self.cumulative(graph, node.right, oracle)
        return total


def get_cost_model(name: str, **kw) -> CostModel:
    name = (name or "cm1").lower()
    if name in {"", "cm1", "c_out", "default"}:
        return CostModel("cm1", **kw)
    if name in {"mm", "cm2"}:
        return CostModel(name, **kw)
    raise ValueError(f"unknown cost model {name!r}")
