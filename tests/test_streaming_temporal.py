"""Temporal (batch) + Structured Streaming operators vs DuckDB oracles."""

import pytest

from query_optimizer_spark import streaming
from query_optimizer_spark.functions import temporal
from query_optimizer_spark.harness import result_hash

from .conftest import SF_DIR
from .test_spark_exec import duck_hash

BATCH_OPS = {
    "evt_hourly_rollup": (temporal.hourly_rollup, temporal.hourly_rollup_oracle()),
    "evt_sessionize": (temporal.sessionize, temporal.sessionize_oracle()),
    "evt_asof_join": (temporal.asof_join, temporal.asof_join_oracle()),
}


@pytest.mark.parametrize("name", sorted(BATCH_OPS))
def test_temporal_matches_duckdb(name, spark, duck):
    runner, oracle = BATCH_OPS[name]
    df = runner(spark, SF_DIR)
    got = result_hash(df)
    expected = duck_hash(duck, oracle)
    assert got[0] > 0
    assert got == expected, f"{name}: spark={got} duck={expected}"


def test_stream_hourly_matches_batch_oracle(spark, duck):
    df = streaming.hourly_counts_stream(spark, SF_DIR)
    got = result_hash(df)
    expected = duck_hash(duck, streaming.hourly_counts_stream_oracle())
    assert got[0] > 0
    assert got == expected


def test_stream_sessionize_matches_oracle(spark, duck):
    df = streaming.sessionize_stream(spark, SF_DIR)
    got = result_hash(df)
    expected = duck_hash(duck, streaming.sessionize_stream_oracle())
    assert got[0] > 0
    assert got == expected


def test_stream_is_streaming(spark):
    sdf = streaming.stream_events(spark, SF_DIR)
    assert sdf.isStreaming


def test_stream_asof_matches_batch_asof(spark):
    """The streaming carry-forward as-of must equal the batch window
    as-of row-for-row -- two independent implementations, one
    semantics (the oracle checks both against DuckDB's native ASOF
    JOIN; this checks them against each other)."""
    from query_optimizer_spark.functions.temporal import asof_join
    from query_optimizer_spark.streaming import asof_stream

    from .conftest import SF_DIR

    batch = {
        (r.event_id, r.user_id, r.purchase_value, r.ms_since_purchase)
        for r in asof_join(spark, SF_DIR).collect()
    }
    stream = {
        (r.event_id, r.user_id, r.purchase_value, r.ms_since_purchase)
        for r in asof_stream(spark, SF_DIR).collect()
    }
    assert batch and stream == batch


def test_value_quantiles_match_sorted_definition(spark, duck):
    """The histogram-walk quantile must equal the brute-force type-1
    quantile computed by sorting each group (independent check of the
    cum*100 >= q*n arithmetic)."""
    import math

    from query_optimizer_spark.functions.temporal import value_quantiles

    from .conftest import SF_DIR

    rows = {r.event_type: r for r in value_quantiles(spark, SF_DIR).collect()}
    for etype, r in rows.items():
        vals = [
            v
            for (v,) in duck.execute(
                "SELECT value FROM events WHERE event_type = ?"
                " ORDER BY value",
                [etype],
            ).fetchall()
        ]
        assert r.n_events == len(vals)
        for q, got in ((50, r.p50), (90, r.p90), (99, r.p99)):
            expect = vals[math.ceil(q * len(vals) / 100) - 1]
            assert got == expect, (etype, q, got, expect)


def test_markov_stationary_is_fixpoint(spark, duck):
    """The reported distribution sums to ~1 and is (near-)invariant
    under one more exact transition step -- the fixpoint property that
    defines stationarity."""
    from query_optimizer_spark.functions.temporal import markov_stationary

    from .conftest import SF_DIR

    rows = {r.event_type: r for r in
            markov_stationary(spark, SF_DIR).collect()}
    total = sum(r.stationary for r in rows.values())
    assert total == __import__("pytest").approx(1.0, abs=1e-4)
    # exact transition probabilities from the data
    trans = duck.execute("""
        WITH o AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY epoch_ms(ts), event_id)
                       AS next_type
            FROM events
        )
        SELECT event_type, next_type, count(*)
        FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
    """).fetchall()
    C = {(t, u): n for t, u, n in trans}
    types = sorted(rows)
    rs = {t: sum(C.get((t, u), 0) for u in types) for t in types}
    pi = {t: rows[t].stationary for t in types}
    nxt = {
        u: sum(pi[t] * C.get((t, u), 0) / rs[t] for t in types if rs[t])
        for u in types
    }
    for t in types:
        assert abs(nxt[t] - pi[t]) < 5e-3, t  # one more step barely moves
