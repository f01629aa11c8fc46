"""Outer-join typing (J14), outer-join removal (J11), self-join removal
(J12), and the build-side row-width tiebreak (J13) -- the reference
rewrites deferred in round 1 (VERDICT r1 items 7 and 'missing' 4-5).

Reference semantics: MyLoptOptimizeJoinRule.java findRemovableOuterJoins
:157-263, findRemovableSelfJoins :314-368, addToTop typing :1231-1239,
swapInputs :1907-1936, rowWidthCost :1024-1037.
"""

import pytest

from query_optimizer_spark.costmodels import get_cost_model
from query_optimizer_spark.executor import Renderer, physical_plan, query_to_sql
from query_optimizer_spark.harness import result_hash
from query_optimizer_spark.joingraph import JoinGraph
from query_optimizer_spark.oracle import TrueCountOracle
from query_optimizer_spark.planners import PLANNERS
from query_optimizer_spark.rewrites import simplify
from query_optimizer_spark.sqlparse import ParseError, parse
from query_optimizer_spark.workload import FIXTURES, run_fixture

from .conftest import SF_DIR
from .test_spark_exec import duck_hash

OUTER_FIXTURES = [
    "join_outer_3",
    "join_outer_removed",
    "join_outer_full",
    "join_selfjoin_removed",
]


# --- parsing ---------------------------------------------------------------


def test_parse_left_join_marks_null_generating():
    q = parse(FIXTURES["join_outer_3"])
    assert q.null_generating == {"o"}
    assert not q.full_outer
    # the ON filter landed as an on_filter, not a WHERE filter
    assert any(p.col.alias == "o" for p in q.on_filters)
    assert not any(p.col.alias == "o" for p in q.filters)


def test_parse_full_outer():
    q = parse(FIXTURES["join_outer_full"])
    assert q.full_outer and q.null_generating == {"n1", "r"}


def test_null_rejecting_where_simplifies_to_inner():
    q = parse(
        "SELECT MIN(c.c_name) AS m FROM customer c "
        "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "WHERE o.o_totalprice > 100"
    )
    assert q.null_generating == set()  # outer degenerated to inner


def test_unsupported_outer_shapes_raise():
    with pytest.raises(ParseError):  # IS NULL on outer side = anti-join
        parse(
            "SELECT MIN(c.c_name) AS m FROM customer c "
            "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
            "WHERE o.o_orderstatus IS NULL"
        )
    with pytest.raises(ParseError):  # RIGHT JOIN
        parse(
            "SELECT MIN(c.c_name) AS m FROM customer c "
            "RIGHT JOIN orders o ON o.o_custkey = c.c_custkey"
        )
    with pytest.raises(ParseError):  # ON filter on the preserved side
        parse(
            "SELECT MIN(c.c_name) AS m FROM customer c "
            "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
            "AND c.c_acctbal > 0"
        )


# --- planning / typing -----------------------------------------------------


def test_all_planners_type_outer_join_on_top():
    oracle = TrueCountOracle(SF_DIR)
    cm = get_cost_model("cm1")
    graph = JoinGraph.from_query(parse(FIXTURES["join_outer_3"]))
    for name, planner in PLANNERS.items():
        res = planner(graph, oracle, cm)
        if res is None:
            continue
        order = res.order_str()
        assert order.startswith("LEFTJOIN("), (name, order)
        assert order.endswith(",o)"), (name, order)


def test_full_outer_plan():
    oracle = TrueCountOracle(SF_DIR)
    cm = get_cost_model("cm1")
    graph = JoinGraph.from_query(parse(FIXTURES["join_outer_full"]))
    res = PLANNERS["dp_ccp"](graph, oracle, cm)
    assert res.order_str() == "FULLJOIN(n1,r)"


# --- removal rewrites ------------------------------------------------------


def test_outer_join_removal():
    oracle = TrueCountOracle(SF_DIR)
    g = simplify(parse(FIXTURES["join_outer_removed"]), oracle)
    assert g.aliases == ["l"]  # orders dropped: unique key, not projected


def test_outer_join_not_removed_when_projected():
    oracle = TrueCountOracle(SF_DIR)
    g = simplify(parse(FIXTURES["join_outer_3"]), oracle)
    assert "o" in g.aliases  # o_totalprice is projected -> must stay


def test_self_join_removal():
    oracle = TrueCountOracle(SF_DIR)
    g = simplify(parse(FIXTURES["join_selfjoin_removed"]), oracle)
    assert g.aliases == ["c1"]  # c2 merged into c1 (unique c_custkey)


def test_self_join_not_removed_on_non_unique_key():
    # join_selfjoin_4 joins nation to itself on n_regionkey (NOT unique)
    oracle = TrueCountOracle(SF_DIR)
    g = simplify(parse(FIXTURES["join_selfjoin_4"]), oracle)
    assert set(g.aliases) == {"c", "s", "n1", "n2"}


# --- execution vs DuckDB ---------------------------------------------------


@pytest.mark.parametrize("name", OUTER_FIXTURES)
def test_outer_fixture_matches_oracle(name, spark, duck):
    oracle = TrueCountOracle(SF_DIR)
    df = run_fixture(spark, SF_DIR, name, oracle=oracle)
    assert result_hash(df) == duck_hash(
        duck, query_to_sql(parse(FIXTURES[name]))
    )


def test_outer_fixture_all_planners_agree(spark, duck):
    oracle = TrueCountOracle(SF_DIR)
    want = duck_hash(duck, query_to_sql(parse(FIXTURES["join_outer_3"])))
    for pname in PLANNERS:
        df = run_fixture(
            spark, SF_DIR, "join_outer_3", planner=pname, oracle=oracle
        )
        assert result_hash(df) == want, pname


# --- J13 row width ---------------------------------------------------------


def test_row_width_cost():
    graph = JoinGraph.from_query(parse(FIXTURES["join_chain_3"]))
    oracle = TrueCountOracle(SF_DIR)
    cm = get_cost_model("cm1")
    res = PLANNERS["dp_ccp"](graph, oracle, cm)
    r = Renderer(None, SF_DIR, graph, None)
    from query_optimizer_spark.joingraph import Leaf

    widths = {a: r._row_width(Leaf(i, a)) for i, a in enumerate(graph.aliases)}
    # leaf width == referenced column count
    assert widths == {
        a: len(r.needed_cols[a]) for a in graph.aliases
    }
    # a join's width includes itself plus both children (lower = heavier)
    tree = res.tree
    assert r._row_width(tree) > sum(widths.values())


def test_outer_on_filter_reaches_scan(spark):
    """The ON filter on the null-generating side is leaf-applied, so it
    must push into the orders parquet scan like any inner filter."""
    oracle = TrueCountOracle(SF_DIR)
    df = run_fixture(spark, SF_DIR, "join_outer_3", oracle=oracle)
    plan = physical_plan(df)
    assert "GreaterThan(o_totalprice" in plan
