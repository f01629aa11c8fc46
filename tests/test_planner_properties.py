"""Property-based planner tests (hypothesis) on random join graphs with
random cardinalities -- the SURVEY §5 rebuild test plan:

- every planner produces a valid tree covering all factors exactly once;
- dp_ccp is optimal: <= every other planner, == brute force;
- left-deep DP >= DPccp (its space is a subset).
"""

import random

from hypothesis import given, settings, strategies as st

from query_optimizer_spark.costmodels import get_cost_model
from query_optimizer_spark.joingraph import Edge, JoinGraph, bits
from query_optimizer_spark.oracle import CardinalityOracle
from query_optimizer_spark.planners import PLANNERS
from query_optimizer_spark.joingraph import validate_tree

from .test_core import brute_force_best


@st.composite
def random_graph_and_oracle(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    seed = draw(st.integers(min_value=0, max_value=10_000))
    rng = random.Random(seed)
    aliases = [f"t{i}" for i in range(n)]
    # random connected-ish edge set: a spanning tree plus extras
    edges = set()
    order = list(range(n))
    rng.shuffle(order)
    for i in range(1, n):
        a = order[i]
        b = order[rng.randrange(i)]
        edges.add((min(a, b), max(a, b)))
    for _ in range(rng.randrange(0, n)):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    from query_optimizer_spark.sqlparse import ColumnRef, Predicate

    graph = JoinGraph(
        aliases=aliases,
        tables={a: "tab" for a in aliases},
        filters={a: () for a in aliases},
        edges=[
            Edge(
                (1 << a) | (1 << b),
                (
                    Predicate(
                        "cmp",
                        ColumnRef(aliases[a], "k"),
                        "=",
                        ColumnRef(aliases[b], "k"),
                    ),
                ),
            )
            for a, b in sorted(edges)
        ],
    )
    # random cardinalities for every subset (cross products included so
    # disconnected-component fallbacks can be costed)
    cards = {}
    for s in range(1, 1 << n):
        cards[graph.key_for(s)] = float(rng.randrange(1, 100_000))
    return graph, CardinalityOracle(cards)


@settings(max_examples=60, deadline=None)
@given(random_graph_and_oracle(), st.sampled_from(["cm1", "mm", "cm2"]))
def test_planner_invariants(graph_oracle, cm_name):
    graph, oracle = graph_oracle
    cm = get_cost_model(cm_name)
    results = {}
    for pname, fn in PLANNERS.items():
        res = fn(graph, oracle, cm)
        if res is None:
            continue
        validate_tree(graph, res.tree)
        results[pname] = res
    dp = results["dp_ccp"]
    for pname, res in results.items():
        assert dp.cost <= res.cost + 1e-6, f"{pname} beat dp_ccp"
    if graph.connected(graph.all_factors):
        bf = brute_force_best(graph, oracle, cm)
        assert abs(dp.cost - bf) < 1e-6
    assert results["left_deep"].cost >= dp.cost - 1e-6


def test_greedy_distinct_count_tiebreak_changes_plan():
    """A2 consumption (VERDICT r1 item 5): when two candidate factors
    cost exactly the same, the one whose join key has fewer distinct
    values must be chosen -- flipping the metadata flips the plan."""
    from query_optimizer_spark.planners import plan_greedy
    from query_optimizer_spark.sqlparse import parse

    sql = "SELECT MIN(a.x) AS m FROM ta a, tb b, tc c WHERE a.x = b.x AND a.y = c.y"
    graph = JoinGraph.from_query(parse(sql))
    cm = get_cost_model("cm1")
    base = {graph.key_for(1 << i): 100.0 for i in range(3)}
    ab = graph.key_for(0b011)
    ac = graph.key_for(0b101)
    abc = graph.key_for(0b111)
    base.update({ab: 50.0, ac: 50.0, abc: 25.0})

    lo_c = CardinalityOracle({**base, "b#x": 10.0, "c#y": 2.0})
    lo_b = CardinalityOracle({**base, "b#x": 2.0, "c#y": 10.0})
    res_c = plan_greedy(graph, lo_c, cm)
    res_b = plan_greedy(graph, lo_b, cm)
    assert res_c.order_str() == "JOIN(JOIN(a,c),b)"
    assert res_b.order_str() == "JOIN(JOIN(a,b),c)"
    # costs identical -- only the tie-break differs
    assert res_c.cost == res_b.cost

    # J3 alternatives: one retained plan per start factor, cheapest wins
    assert res_c.alternatives is not None and len(res_c.alternatives) == 3
    assert {a["start"] for a in res_c.alternatives} == {"a", "b", "c"}
    assert min(a["cost"] for a in res_c.alternatives) == res_c.cost
    assert res_c.order_str() in {a["order"] for a in res_c.alternatives}


def test_bushy_finds_balanced_plan():
    """J8: on a 4-chain where the two endpoint pairs are each tiny but
    any 3-subset is huge, greedy-bushy must produce the balanced
    (A,B)x(C,D) tree that left-deep construction cannot express."""
    from query_optimizer_spark.planners import plan_bushy
    from query_optimizer_spark.sqlparse import parse

    sql = (
        "SELECT MIN(a.x) AS m FROM ta a, tb b, tc c, td d "
        "WHERE a.x = b.x AND b.y = c.y AND c.z = d.z"
    )
    graph = JoinGraph.from_query(parse(sql))
    cm = get_cost_model("cm1")
    cards = {graph.key_for(1 << i): 1000.0 for i in range(4)}
    for s, v in {
        0b0011: 10.0,   # ab tiny
        0b1100: 10.0,   # cd tiny
        0b0110: 1e6,    # bc huge
        0b0111: 1e6, 0b1110: 1e6, 0b1111: 20.0,
    }.items():
        cards[graph.key_for(s)] = v
    oracle = CardinalityOracle(cards)
    res = plan_bushy(graph, oracle, cm)
    assert res.order_str() == "JOIN(JOIN(a,b),JOIN(c,d))"
    # and it lands on the DP optimum here
    from query_optimizer_spark.planners import plan_dp_ccp

    assert res.cost == plan_dp_ccp(graph, oracle, cm).cost


@st.composite
def random_outer_graph(draw):
    """Random inner core + 1-2 null-generating factors hung off it."""
    graph, oracle = draw(random_graph_and_oracle())
    n = graph.n
    n_outer = draw(st.integers(min_value=1, max_value=2))
    rng = random.Random(draw(st.integers(min_value=0, max_value=9999)))
    from query_optimizer_spark.sqlparse import ColumnRef, Predicate

    aliases = list(graph.aliases)
    edges = list(graph.edges)
    ng_mask = 0
    for j in range(n_outer):
        a = f"g{j}"
        target = rng.randrange(n)
        idx = len(aliases)
        aliases.append(a)
        pred = Predicate(
            "cmp",
            ColumnRef(a, "k"),
            "=",
            ColumnRef(graph.aliases[target], "k"),
        )
        edges.append(Edge((1 << idx) | (1 << target), (pred,)))
        ng_mask |= 1 << idx
    g2 = JoinGraph(
        aliases=aliases,
        tables={**graph.tables, **{a: a for a in aliases[n:]}},
        filters={**graph.filters, **{a: () for a in aliases[n:]}},
        edges=edges,
        null_generating=ng_mask,
    )
    cards = dict(oracle.cards)
    rng2 = random.Random(1234)
    for s in range(1, 1 << g2.n):
        key = g2.key_for(s)
        if key not in cards:
            cards[key] = float(rng2.randrange(1, 100_000))
    return g2, CardinalityOracle(cards)


@given(random_outer_graph())
@settings(max_examples=40, deadline=None)
def test_planners_respect_outer_typing(graph_oracle):
    """Every planner on a graph with null-generating factors must (a)
    produce a valid tree (validate_tree enforces outer placement), and
    (b) type exactly the null-generating joins as LEFT."""
    from query_optimizer_spark.joingraph import iter_joins

    graph, oracle = graph_oracle
    cm = get_cost_model("cm1")
    for name, planner in PLANNERS.items():
        res = planner(graph, oracle, cm)
        if res is None:
            continue
        validate_tree(graph, res.tree)
        n_left = sum(1 for j in iter_joins(res.tree) if j.how == "left")
        assert n_left == bin(graph.null_generating).count("1"), name


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=2, max_value=7))
def test_ikkbz_optimal_left_deep_on_trees(seed, n):
    """On a tree-shaped query graph with an ASI-consistent oracle
    (card(S) = prod n_i * prod f_e) under cm1/C_out, IKKBZ must equal the
    exponential left-deep DP: both are optimal over cross-product-free
    left-deep orders, IKKBZ in polynomial time."""
    from query_optimizer_spark.planners import plan_ikkbz, plan_left_deep
    from query_optimizer_spark.sqlparse import ColumnRef, Predicate

    rng = random.Random(seed)
    aliases = [f"t{i}" for i in range(n)]
    # random spanning tree only -- no extra edges
    edges = []
    order = list(range(n))
    rng.shuffle(order)
    for i in range(1, n):
        a, b = order[i], order[rng.randrange(i)]
        edges.append((min(a, b), max(a, b)))
    graph = JoinGraph(
        aliases=aliases,
        tables={a: "tab" for a in aliases},
        filters={a: () for a in aliases},
        edges=[
            Edge(
                (1 << a) | (1 << b),
                (
                    Predicate(
                        "cmp",
                        ColumnRef(aliases[a], "k"),
                        "=",
                        ColumnRef(aliases[b], "k"),
                    ),
                ),
            )
            for a, b in edges
        ],
    )
    base = {i: float(rng.randrange(1, 10_000)) for i in range(n)}
    f = {e: rng.uniform(1e-4, 1.0) for e in edges}
    cards = {}
    for s in range(1, 1 << n):
        rows = 1.0
        for i in bits(s):
            rows *= base[i]
        for (a, b), fe in f.items():
            if (s >> a) & 1 and (s >> b) & 1:
                rows *= fe
        cards[graph.key_for(s)] = max(rows, 1e-9)
    oracle = CardinalityOracle(cards)
    cm = get_cost_model("cm1")
    ik = plan_ikkbz(graph, oracle, cm)
    ld = plan_left_deep(graph, oracle, cm)
    validate_tree(graph, ik.tree)
    assert ik.cost <= ld.cost * (1 + 1e-9) + 1e-9, (
        f"IKKBZ {ik.cost} worse than left-deep DP {ld.cost}"
    )


def test_reinforce_planner_deterministic_and_competitive():
    """plan_reinforce trains at plan time (seeded): two calls must give
    the identical tree, and the learned order should be within 2x of
    the dp_ccp optimum on the cyclic 7-relation fixture (it reaches
    1.0x there; the bound leaves slack for feature/seed tweaks)."""
    from query_optimizer_spark.costmodels import get_cost_model
    from query_optimizer_spark.oracle import TrueCountOracle
    from query_optimizer_spark.sqlparse import parse
    from query_optimizer_spark.joingraph import JoinGraph

    from .conftest import SF_DIR
    from .fixtures import ALL

    cm = get_cost_model("cm1")
    oracle = TrueCountOracle(SF_DIR)
    g = JoinGraph.from_query(parse(ALL["q_cycle_7"]))
    a = PLANNERS["reinforce"](g, oracle, cm)
    b = PLANNERS["reinforce"](g, oracle, cm)
    assert a.tree.order_str() == b.tree.order_str()
    opt = PLANNERS["dp_ccp"](g, oracle, cm)
    assert a.cost <= 2.0 * opt.cost


def test_env_factor_mask_restricts_episode():
    """The factors mask (used by plan_reinforce per inner component)
    must expose only masked vertices/edges and finish with a plan over
    exactly those factors."""
    from query_optimizer_spark.agents import RandomAgent, run_episode
    from query_optimizer_spark.costmodels import get_cost_model
    from query_optimizer_spark.env import JoinOrderEnv
    from query_optimizer_spark.oracle import TrueCountOracle
    from query_optimizer_spark.sqlparse import parse
    from query_optimizer_spark.joingraph import JoinGraph

    from .conftest import SF_DIR
    from .fixtures import ALL

    cm = get_cost_model("cm1")
    oracle = TrueCountOracle(SF_DIR)
    g = JoinGraph.from_query(parse(ALL["q_chain_3"]))
    mask = 0b011  # first two factors of the chain
    env = JoinOrderEnv(g, oracle, cm, factors=mask)
    state = env.reset()
    assert {v["id"] for v in state["vertices"]} == {0, 1}
    assert all(
        set(e["factors"]) <= {0, 1} for e in state["edges"]
    )
    run_episode(env, RandomAgent(0))
    assert env.final_plan().factors == mask


def test_frozen_policy_zero_shot():
    """POLICY.json (offline-trained weights, scripts/train_agent.py
    --save-policy) deploys through plan_reinforce without training and
    stays within 1.5x geomean of the dp_ccp optimum across every
    fixture -- measured 1.10 on sf0.001 true counts, which the policy
    never saw (trained at sf0.01 stats estimates)."""
    import math
    import os

    from query_optimizer_spark.agents import load_policy
    from query_optimizer_spark.costmodels import get_cost_model
    from query_optimizer_spark.joingraph import JoinGraph
    from query_optimizer_spark.oracle import TrueCountOracle
    from query_optimizer_spark.planners import plan_reinforce
    from query_optimizer_spark.sqlparse import parse

    from .conftest import SF_DIR
    from .fixtures import ALL

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "POLICY.json",
    )
    agent = load_policy(path)
    cm = get_cost_model("cm1")
    oracle = TrueCountOracle(SF_DIR)
    ratios = []
    for name in ("q_chain_3", "q_star_4", "q_cycle_7", "q_selfjoin"):
        g = JoinGraph.from_query(parse(ALL[name]))
        zero_shot = plan_reinforce(g, oracle, cm, agent=agent)
        opt = PLANNERS["dp_ccp"](g, oracle, cm)
        assert zero_shot.cost >= opt.cost - 1e-9  # optimum is a bound
        ratios.append(zero_shot.cost / opt.cost)
    gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    assert gm <= 1.5, ratios


@settings(max_examples=40, deadline=None)
@given(random_graph_and_oracle(), st.integers(min_value=0, max_value=10**9))
def test_adaptive_replan_pins_materialized_block(graph_oracle, obs_seed):
    """Mid-query re-optimization invariants: the re-planned tree is a
    valid covering tree, the materialized block survives AS A UNIT no
    matter what cardinality feedback says, and with feedback equal to
    the original estimate the completion is never costlier than
    re-costing the original dp_ccp plan (the sunk-cost discount can
    only help)."""
    from query_optimizer_spark.oracle import OverlayOracle
    from query_optimizer_spark.planners import plan_with_materialized
    from query_optimizer_spark.workload import _first_leaf_join

    graph, oracle = graph_oracle
    cm = get_cost_model("cm1")
    base = PLANNERS["dp_ccp"](graph, oracle, cm)
    if len(graph.aliases) < 3:
        return  # nothing left to re-plan after the first join
    first = _first_leaf_join(base.tree)

    # adversarial feedback: anywhere from 1 row to a 10^4x blowup
    rng = random.Random(obs_seed)
    observed = float(rng.choice([1, 10, 10_000, 10**8]))
    overlay = OverlayOracle(oracle, {first.factors: observed})
    res = plan_with_materialized(graph, overlay, cm, first)

    validate_tree(graph, res.tree)
    assert first.order_str() in res.tree.order_str()
    assert overlay.card(graph, first.factors) == observed

    # neutral feedback: sunk-cost replan <= recosted original plan
    neutral = OverlayOracle(oracle, {first.factors: oracle.card(graph, first.factors)})
    res_n = plan_with_materialized(graph, neutral, cm, first)
    recost = cm.cumulative(graph, base.tree, neutral)
    sunk = cm.cumulative(graph, first, neutral)
    assert res_n.cost <= recost - sunk + 1e-6


@settings(max_examples=30, deadline=None)
@given(random_graph_and_oracle())
def test_multiblock_pinning_keeps_every_block(graph_oracle):
    """plan_with_materialized with TWO disjoint pinned blocks must keep
    both atomic in the completion (the progressive/full-LEO loop
    depends on it)."""
    from query_optimizer_spark.joingraph import Leaf, make_join
    from query_optimizer_spark.planners import plan_with_materialized

    graph, oracle = graph_oracle
    n = len(graph.aliases)
    if n < 4:
        return
    cm = get_cost_model("cm1")
    # pick two disjoint edge-connected leaf pairs as pinned blocks
    pairs = []
    used = 0
    for e in graph.edges:
        bs = [i for i in bits(e.factors)]
        if len(bs) == 2 and not (e.factors & used):
            pairs.append(e)
            used |= e.factors
        if len(pairs) == 2:
            break
    if len(pairs) < 2:
        return  # graph shape doesn't allow two disjoint pairs
    blocks = [
        make_join(
            graph,
            Leaf(min(bits(e.factors)), graph.aliases[min(bits(e.factors))]),
            Leaf(max(bits(e.factors)), graph.aliases[max(bits(e.factors))]),
        )
        for e in pairs
    ]
    res = plan_with_materialized(graph, oracle, cm, blocks)
    validate_tree(graph, res.tree)
    s = res.tree.order_str()
    for b in blocks:
        assert b.order_str() in s, (b.order_str(), s)


@settings(max_examples=40, deadline=None)
@given(random_graph_and_oracle(), st.integers(min_value=0, max_value=10**9))
def test_adaptive_replan_outer_graph(graph_oracle, seed):
    """Outer-graph re-planning (r7, VERDICT r6 gap #1): with factors
    marked null-generating, plan_with_materialized must (a) keep an
    INNER pinned block atomic and re-attach every outer factor on top
    as a LEFT join -- never inside the core -- and (b) when the pinned
    block has already swallowed part of the attach frame, complete it
    by attaching the remaining outer factors in factor order."""
    import dataclasses

    from query_optimizer_spark.joingraph import iter_joins
    from query_optimizer_spark.planners import plan_with_materialized
    from query_optimizer_spark.workload import _first_leaf_join

    graph, _ = graph_oracle
    n = len(graph.aliases)
    if n < 4:
        return
    rng = random.Random(seed)
    # pick 1-2 null-generating factors whose removal keeps the inner
    # core connected (the adaptive DP does not cross-join a split core)
    ng = 0
    for _ in range(2):
        cand = [
            i
            for i in range(n)
            if not (ng >> i) & 1
            and popcount_local(graph.all_factors & ~ng & ~(1 << i)) >= 2
            and len(
                graph.components_of(graph.all_factors & ~ng & ~(1 << i))
            ) == 1
        ]
        if not cand:
            break
        ng |= 1 << rng.choice(cand)
    if not ng:
        return
    og = dataclasses.replace(graph, null_generating=ng)
    rng2 = random.Random(seed ^ 0x5EED)
    oracle = CardinalityOracle(
        {
            og.key_for(s): float(rng2.randrange(1, 100_000))
            for s in range(1, 1 << n)
        }
    )
    cm = get_cost_model("cm1")
    base = PLANNERS["dp_ccp"](og, oracle, cm)
    validate_tree(og, base.tree)

    # (a) inner pinned block: the deepest leaf-leaf join of the base
    # plan lies in the inner core whenever the core has >= 2 factors
    first = _first_leaf_join(base.tree)
    if not (first.factors & ng):
        res = plan_with_materialized(og, oracle, cm, first)
        validate_tree(og, res.tree)
        assert first.order_str() in res.tree.order_str()
        for g in bits(ng):
            assert any(
                j.how == "left" and j.right.factors == (1 << g)
                for j in iter_joins(res.tree)
            ), f"factor {g} lost its LEFT attach"
        # every LEFT join sits ABOVE the whole inner core
        inner = og.all_factors & ~ng
        for j in iter_joins(res.tree):
            if j.how == "left":
                assert j.left.factors & inner == inner

    # (b) block that swallowed part of the attach frame: pin the root's
    # LEFT child (core + first outer factor) when two factors are outer
    if popcount_local(ng) == 2:
        partial = base.tree.left
        assert partial.factors & ng  # contains the first attach
        res2 = plan_with_materialized(og, oracle, cm, partial)
        validate_tree(og, res2.tree)
        assert res2.tree.left is partial  # completion is exactly on top
        assert res2.tree.how == "left"
        assert res2.tree.right.factors == ng & ~partial.factors


def popcount_local(x: int) -> int:
    return bin(x).count("1")


def test_adaptive_replan_disconnected_core_cross_joins():
    """A core whose components share no edge (cross fixture shape, or a
    core only linked through an outer factor) must re-plan via the J15
    cross-join frame instead of raising -- parity with the static
    planners' _plan_components (r7 review fix)."""
    import dataclasses

    from query_optimizer_spark.joingraph import Leaf, iter_joins, make_join
    from query_optimizer_spark.planners import plan_with_materialized
    from query_optimizer_spark.sqlparse import parse

    sql = """
        SELECT MIN(a.x) AS m FROM ta a, tb b, tc c, td o
        WHERE a.k = b.k AND a.j = o.j
    """
    graph = JoinGraph.from_query(parse(sql))
    og = dataclasses.replace(
        graph, null_generating=1 << graph.aliases.index("o")
    )
    rng = random.Random(5)
    oracle = CardinalityOracle(
        {
            og.key_for(s): float(rng.randrange(1, 1000))
            for s in range(1, 1 << 4)
        }
    )
    cm = get_cost_model("cm1")
    ia, ib = graph.aliases.index("a"), graph.aliases.index("b")
    block = make_join(
        og, Leaf(ia, "a"), Leaf(ib, "b")
    )  # pinned a-b; c is a disconnected island of the inner core
    res = plan_with_materialized(og, oracle, cm, block)
    validate_tree(og, res.tree)
    assert block.order_str() in res.tree.order_str()
    # the island arrived via a cross join, and o re-attached LEFT on top
    assert any(not j.preds and j.how == "inner" for j in iter_joins(res.tree))
    assert res.tree.how == "left" and res.tree.right.factors == og.null_generating


def test_cardsens_global_optimum_is_the_floor_for_every_arm():
    """r9 VERDICT #3: the sensitivity harness pins every arm's ratio
    denominator to the GLOBAL true optimum (dp_ccp under true cards).
    dp_ccp's space is a superset of every deterministic arm's, so any
    arm's est-planned tree re-costed under truth must cost >= that
    optimum -- the artifact invariant ratio >= 1.0, asserted here on
    real fixtures across the harness's estimator rungs."""
    import scripts.cardinality_sensitivity as cs
    from query_optimizer_spark.oracle import SparkStatsOracle, TrueCountOracle
    from query_optimizer_spark.sqlparse import parse
    from query_optimizer_spark.workload import FIXTURES, _base_rows

    sf_dir = "/root/testdata/sf0.001"
    cm = get_cost_model("cm1")
    true_oracle = TrueCountOracle(sf_dir)
    cs._TRUE_ORACLE = true_oracle
    for fixture in ("join_chain_3", "join_cycle_7", "join_pipeline_5"):
        graph = JoinGraph.from_query(parse(FIXTURES[fixture]))
        true_oracle.precompute_all_connected(graph)
        opt = PLANNERS["dp_ccp"](graph, true_oracle, cm).cost
        rungs = {
            "stats": SparkStatsOracle(_base_rows(sf_dir)),
            "perturb_x8": true_oracle.snapshot().perturbed(
                seed=1, max_factor=8
            ),
            "true": true_oracle,
        }
        for rung_name, est in rungs.items():
            for planner in cs.PLANNER_NAMES:
                tree = cs._plan(planner, graph, est, cm).tree
                got = cm.cumulative(graph, tree, true_oracle)
                assert got >= opt * (1 - 1e-9), (
                    fixture, rung_name, planner, got, opt
                )
        # the global optimum is tight: dp_ccp under truth achieves it
        assert (
            cm.cumulative(
                graph,
                PLANNERS["dp_ccp"](graph, true_oracle, cm).tree,
                true_oracle,
            )
            == opt
        )
