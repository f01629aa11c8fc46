"""Parity extras: parallel planning (E7), cost cache (S7), cache clearing
(E3), semi-join prefilter (J10)."""

from query_optimizer_spark.costmodels import get_cost_model
from query_optimizer_spark.executor import Renderer, physical_plan
from query_optimizer_spark.harness import (
    clear_caches,
    load_cost_cache,
    plan_workload_parallel,
    result_hash,
    save_cost_cache,
)
from query_optimizer_spark.joingraph import JoinGraph
from query_optimizer_spark.oracle import TrueCountOracle
from query_optimizer_spark.planners import plan_dp_ccp
from query_optimizer_spark.sqlparse import parse

from .conftest import SF_DIR
from .fixtures import ALL


def test_parallel_planning_matches_serial():
    oracle = TrueCountOracle(SF_DIR)
    cm = get_cost_model("cm1")
    par = plan_workload_parallel(ALL, oracle, cm, max_workers=4)
    for name, sql in ALL.items():
        graph = JoinGraph.from_query(parse(sql))
        assert abs(par[name] - plan_dp_ccp(graph, oracle, cm).cost) < 1e-9


def test_cost_cache_roundtrip(tmp_path):
    path = tmp_path / "costs.json"
    save_cost_cache({"q1": 12.5, "q2": 3.0}, path)
    assert load_cost_cache(path) == {"q1": 12.5, "q2": 3.0}
    assert load_cost_cache(tmp_path / "missing.json") == {}


def test_semi_prefilter_preserves_results(spark):
    oracle = TrueCountOracle(SF_DIR)
    cm = get_cost_model("cm1")
    sql = ALL["q_cycle_7"]
    graph = JoinGraph.from_query(parse(sql))
    res = plan_dp_ccp(graph, oracle, cm)
    plain = Renderer(spark, SF_DIR, graph, oracle).run(res.tree)
    pre = Renderer(spark, SF_DIR, graph, oracle, semi_prefilter=True).run(
        res.tree
    )
    assert result_hash(plain) == result_hash(pre)
    assert "LeftSemi" in physical_plan(pre)
    assert "LeftSemi" not in physical_plan(plain)


def test_clear_caches(spark):
    df = spark.read.parquet(f"{SF_DIR}/region.parquet").cache()
    df.count()
    clear_caches(spark)  # no exception; cache dropped
    assert not df.storageLevel.useMemory or df.count() == 5


def test_result_hash_distributed_matches_local(spark):
    """The executor-side partial-sum hash must agree with the driver-side
    pandas reference on results covering every value class the engine
    emits: dates, timestamps, arrays, floats, nulls, strings, bigints
    (VERDICT r1 item 6 -- removes the driver-memory ceiling)."""
    import __spark_entry__ as entry
    from query_optimizer_spark.harness import _result_hash_local

    qs = entry.queries()
    diverse = [
        "sql_date_arith",      # DATE
        "sql_null_funcs",      # NULLs
        "sql_array_agg_sorted",  # array<string>
        "evt_hourly_rollup",   # timestamps
        "sql_median",          # floats
        "dedup_exact",         # strings/bigints
    ]
    for name in diverse:
        df = qs[name](spark, SF_DIR)
        assert result_hash(df) == _result_hash_local(df), name
    # empty result: distributed path must return (0, zero-hash) too
    empty = spark.range(1).filter("id < 0").selectExpr(
        "id", "cast(id as string) s", "cast(id as double) d"
    )
    assert result_hash(empty) == _result_hash_local(empty) == (0, f"{0:032x}")
