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


def test_sampled_oracle_qerror_bounded():
    """The sampling estimator's q-error (max(est/true, true/est)) must be
    materially tighter than the stats oracle's on the fixture join
    graphs -- that's its reason to exist.  Deterministic: the sample is
    a pure hash of the data."""
    from query_optimizer_spark.joingraph import JoinGraph, bits, popcount
    from query_optimizer_spark.sqlparse import parse
    from query_optimizer_spark.workload import (
        FIXTURES,
        sampled_oracle,
        stats_oracle,
        true_oracle,
    )

    sf = "/root/testdata/sf0.01"
    true_o = true_oracle(sf)

    def qerr(est, true):
        est, true = max(est, 1.0), max(true, 1.0)
        return max(est / true, true / est)

    samp_errs, stats_errs = [], []
    for fx in ["join_chain_3", "join_star_4", "join_events_8"]:
        graph = JoinGraph.from_query(parse(FIXTURES[fx]))
        samp_o = sampled_oracle(sf, p=0.2)
        stat_o = stats_oracle(sf)
        for s in range(1, graph.all_factors + 1):
            if popcount(s) < 2 or not graph.connected(s):
                continue
            t = true_o.card(graph, s)
            samp_errs.append(qerr(samp_o.card(graph, s), t))
            stats_errs.append(qerr(stat_o.card(graph, s), t))
    med = sorted(samp_errs)[len(samp_errs) // 2]
    med_stats = sorted(stats_errs)[len(stats_errs) // 2]
    assert max(samp_errs) < 3.0, f"sampling q-error blew up: {max(samp_errs)}"
    assert med <= med_stats, (samp_errs, stats_errs)


def test_sampled_oracle_rejects_bad_rate():
    import pytest as _pytest

    from query_optimizer_spark.oracle import SampledCountOracle

    with _pytest.raises(ValueError):
        SampledCountOracle("/root/testdata/sf0.001", p=0.0)
    with _pytest.raises(ValueError):
        SampledCountOracle("/root/testdata/sf0.001", p=1.5)


def test_sketch_oracle_estimates():
    """SketchOracle: single tables are exact (real filtered counts),
    HLL NDVs are near-exact on these key columns, and join estimates
    beat the fixed-heuristic stats oracle (its reason to exist)."""
    from query_optimizer_spark.joingraph import JoinGraph, popcount
    from query_optimizer_spark.sqlparse import parse
    from query_optimizer_spark.workload import (
        FIXTURES,
        sketch_oracle,
        stats_oracle,
        true_oracle,
    )

    sf = "/root/testdata/sf0.01"
    true_o = true_oracle(sf)
    sk_o = sketch_oracle(sf)
    st_o = stats_oracle(sf)

    def qerr(est, true):
        est, true = max(est, 1.0), max(true, 1.0)
        return max(est / true, true / est)

    sk_errs, st_errs = [], []
    for fx in ["join_chain_3", "join_star_4", "join_events_8"]:
        graph = JoinGraph.from_query(parse(FIXTURES[fx]))
        for s in range(1, graph.all_factors + 1):
            if not graph.connected(s):
                continue
            t = true_o.card(graph, s)
            if popcount(s) == 1:
                # real filtered scan count: exact by construction
                assert sk_o.card(graph, s) == t
            else:
                sk_errs.append(qerr(sk_o.card(graph, s), t))
                st_errs.append(qerr(st_o.card(graph, s), t))
        # determinism: same instance, same answers
        assert sk_o.card(graph, graph.all_factors) == sk_o.card(
            graph, graph.all_factors
        )
    med_sk = sorted(sk_errs)[len(sk_errs) // 2]
    med_st = sorted(st_errs)[len(st_errs) // 2]
    assert med_sk <= med_st, (sk_errs, st_errs)


def test_result_hash_jvm_properties(spark):
    """The JVM-side verification hash (E8 fast path) must be
    order/partitioning-insensitive, multiset-safe, and null-distinct --
    and agree with itself across different physical plans of the same
    result (the cross-planner use case)."""
    from query_optimizer_spark.harness import result_hash_jvm

    df = spark.range(1000).selectExpr(
        "id", "cast(id % 7 as string) s",
        "case when id % 10 = 0 then null else id * 1.5 end d",
    )
    base = result_hash_jvm(df)
    assert base[0] == 1000
    # repartitioned/reordered physical layout: same hash
    assert result_hash_jvm(df.repartition(13, "s")) == base
    assert result_hash_jvm(df.orderBy("d")) == base
    # column order must not matter (sorted internally)
    assert result_hash_jvm(df.select("d", "s", "id")) == base
    # a different multiset must differ
    other = spark.range(1000).selectExpr(
        "id", "cast(id % 7 as string) s",
        "case when id % 10 = 1 then null else id * 1.5 end d",
    )
    assert result_hash_jvm(other) != base
    # NULL must not collide with the literal string 'NULL' (the NUL-byte
    # tag makes them distinct; only a string that IS the tag collides,
    # and NUL bytes don't occur in engine output)
    a = spark.sql("select cast(null as string) s")
    b = spark.sql("select 'NULL' s")
    assert result_hash_jvm(a) != result_hash_jvm(b)
    # empty result
    empty = df.filter("id < 0")
    assert result_hash_jvm(empty) == (0, f"{0:016x}")


def test_result_hash_jvm_is_faster(spark):
    """On a wide multi-million-row result the JVM hash must beat the
    per-row Python md5 path decisively (VERDICT r5 #7: 'local gate wall
    time drops measurably')."""
    import time

    from query_optimizer_spark.harness import result_hash, result_hash_jvm

    df = spark.range(3_000_000).selectExpr(
        "id", "cast(id % 97 as string) s", "id * 1.5 d",
        "cast(id % 13 as int) i",
    ).cache()
    df.count()  # materialize the cache, warm codegen
    t_jvm = t_py = None
    for _ in range(2):  # best-of-2: first rep pays job warmup
        t0 = time.monotonic()
        n_jvm, _ = result_hash_jvm(df)
        dt = time.monotonic() - t0
        t_jvm = dt if t_jvm is None else min(t_jvm, dt)
        t0 = time.monotonic()
        n_py, _ = result_hash(df)
        dt = time.monotonic() - t0
        t_py = dt if t_py is None else min(t_py, dt)
    df.unpersist()
    assert n_jvm == n_py == 3_000_000
    # steady state is ~3x; require >=1.8x to stay flake-proof
    assert t_py / t_jvm >= 1.8, (t_py, t_jvm)
