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
    "join_selfjoin_removed_composite",
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


# --- review-pass regressions (round-2 self-review findings) ----------------


def test_where_equijoin_on_outer_alias_simplifies():
    """A WHERE equijoin referencing the outer alias is null-rejecting:
    the LEFT JOIN must degenerate to inner, NOT reroute the conjunct
    into the ON clause (which would keep null-extended rows)."""
    q = parse(
        "SELECT MIN(c.c_name) AS m FROM customer c, nation n1 "
        "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "WHERE c.c_nationkey = n1.n_nationkey "
        "AND o.o_custkey = n1.n_nationkey"
    )
    assert q.null_generating == set()
    # and the rendered SQL keeps the conjunct in WHERE
    sql = query_to_sql(q)
    assert "LEFT JOIN" not in sql


def test_on_conjunct_must_reference_joined_alias():
    with pytest.raises(ParseError):
        parse(
            "SELECT MIN(c.c_name) AS m FROM customer c, orders b "
            "LEFT JOIN nation n1 ON c.c_nationkey = b.o_custkey"
        )


def test_isnull_allowed_after_simplification():
    """IS NULL on an alias whose outer join already degenerated to inner
    (via another null-rejecting filter) is an ordinary filter."""
    q = parse(
        "SELECT MIN(c.c_name) AS m FROM customer c "
        "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "WHERE o.o_totalprice > 100 AND o.o_comment IS NULL"
    )
    assert q.null_generating == set()


def test_outer_join_chain_unwinds():
    """g <- h chains must unwind in reverse (h's ON references g, so h
    removes first, then g), reproducing the reference's retryCandidates
    loop."""
    from query_optimizer_spark.oracle import CardinalityOracle

    q = parse(
        "SELECT MIN(a.x) AS m FROM ta a "
        "LEFT JOIN tg g ON g.k = a.k "
        "LEFT JOIN th h ON h.k = g.k"
    )
    graph = JoinGraph.from_query(q)
    oracle = CardinalityOracle(
        {"g#k": 50.0, "g#rows": 50.0, "h#k": 70.0, "h#rows": 70.0}
    )
    g2 = simplify(q, oracle)
    assert g2.aliases == ["a"]


def test_multicolumn_key_needs_nonnull_metadata():
    """Multi-column proofs must use the NULL-aware distinct count
    (``alias#!cols`` keys): plain count(DISTINCT (a,b)) counts
    NULL-bearing tuples that join equality drops, so an oracle carrying
    only ``a#k1,k2`` metadata conservatively declines, while one with
    the non-null tuple count proving uniqueness removes the pair."""
    from query_optimizer_spark.oracle import CardinalityOracle
    from query_optimizer_spark.rewrites import remove_redundant_self_joins

    q = parse(
        "SELECT MIN(a.x) AS m FROM tt a, tt b "
        "WHERE a.k1 = b.k1 AND a.k2 = b.k2"
    )
    graph = JoinGraph.from_query(q)
    # struct-distinct metadata only: unsound for composites -> decline
    oracle = CardinalityOracle({"a#k1,k2": 100.0, "a#rows": 100.0})
    assert remove_redundant_self_joins(q, graph, oracle) is q  # unchanged
    # null-aware proof present and exact -> remove
    proven = CardinalityOracle({"a#!k1,k2": 100.0, "a#rows": 100.0})
    q2 = remove_redundant_self_joins(q, graph, proven)
    assert [a for _, a in q2.tables] == ["a"]
    # null-bearing rows exist (non-null distinct < rows) -> decline:
    # those rows never self-match, so the collapse would resurrect them
    nulls = CardinalityOracle({"a#!k1,k2": 99.0, "a#rows": 100.0})
    assert remove_redundant_self_joins(q, graph, nulls) is q


def test_composite_self_join_removed_fixture():
    """events(user_id, ts) is unique as a pair (user_id alone is not):
    the null-aware composite proof collapses the self-join to one scan."""
    oracle = TrueCountOracle(SF_DIR)
    g = simplify(parse(FIXTURES["join_selfjoin_removed_composite"]), oracle)
    assert g.aliases == ["e1"]


def test_composite_nonunique_key_not_removed():
    """lineitem (l_orderkey, l_linenumber) has duplicate pairs in this
    testdata -- the composite proof must measure, not assume: the pair
    stays joined."""
    oracle = TrueCountOracle(SF_DIR)
    g = simplify(
        parse(
            "SELECT MIN(a.l_extendedprice) AS m FROM lineitem a, lineitem b "
            "WHERE a.l_orderkey = b.l_orderkey "
            "AND a.l_linenumber = b.l_linenumber"
        ),
        oracle,
    )
    assert set(g.aliases) == {"a", "b"}


def test_semi_prefilter_outer_safe(spark, duck):
    """Semi-join prefiltering must skip edges to null-generating
    factors: the preserved side may not be pre-reduced against an
    outer-joined dim."""
    from query_optimizer_spark.workload import run_fixture_semi_prefilter

    df = run_fixture_semi_prefilter(spark, SF_DIR, "join_outer_3")
    assert result_hash(df) == duck_hash(
        duck, query_to_sql(parse(FIXTURES["join_outer_3"]))
    )


def test_outer_query_matrix_cross_engine(spark, duck):
    """Generic semantic guard: the FULL cross product of outer-join
    variants -- (no ON filter / ON filter) x (plain WHERE / extra inner
    filter / null-rejecting single-alias WHERE -> simplifies to inner /
    null-rejecting post-join filter -> simplifies) -- runs through the
    whole planner pipeline (planners round-robin, all six covered) and
    must hash-match DuckDB executing the rendered SQL twin.  This is
    the bug class the round-2 review caught (ON/WHERE misrouting),
    kept from regressing by construction."""
    from itertools import product

    cm = get_cost_model("cm1")
    oracle = TrueCountOracle(SF_DIR)
    on_filters = ["", " AND o.o_totalprice > 100000",
                  " AND o.o_orderstatus = 'F'"]
    where_extras = ["", " AND n1.n_regionkey < 3",
                    " AND o.o_totalprice > 50000",  # simplifies to inner
                    " AND c.c_acctbal > o.o_totalprice"]  # post-join, simplifies
    selects = [
        "MIN(c.c_name) AS m, COUNT(c.c_custkey) AS n",
        "MIN(o.o_totalprice) AS m2, COUNT(c.c_custkey) AS n",
    ]
    planners = list(PLANNERS)
    for i, (onf, wex) in enumerate(product(on_filters, where_extras)):
        sql = (
            f"SELECT {selects[i % 2]} FROM customer c, nation n1 "
            "LEFT JOIN orders o ON o.o_custkey = c.c_custkey"
            f"{onf} "
            "WHERE c.c_nationkey = n1.n_nationkey"
            f"{wex}"
        )
        q = parse(sql)
        graph = simplify(q, oracle)
        pname = planners[i % len(planners)]
        res = PLANNERS[pname](graph, oracle, cm)
        if res is None:  # branch_and_bound edge guard
            res = PLANNERS["dp_ccp"](graph, oracle, cm)
        df = Renderer(spark, SF_DIR, graph, oracle).run(res.tree)
        assert result_hash(df) == duck_hash(duck, query_to_sql(q)), (
            i, pname, sql,
        )
