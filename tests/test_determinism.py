"""Partition-count invariance: the driver runs queries() under ITS OWN
session config (e.g. spark.sql.shuffle.partitions=200 default), so every
op must hash identically under different parallelism -- any hidden
dependence on partitioning (collect order, float sum order, row order)
would pass local tests and fail the driver gate."""

import pytest

from query_optimizer_spark.functions.registry import PIPELINE_OPS
from query_optimizer_spark.harness import result_hash

from .conftest import SF_DIR

# shuffle-sensitive representatives of each family
OPS = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "sim_lsh_ann_topk",
    "corpus_tfidf_topk",
    "corpus_vocab_topk",
    "evt_sessionize",
    "text_fingerprint",
    "mm_binary_stats",
]


@pytest.mark.parametrize("name", OPS)
def test_partition_invariance(name, spark):
    runner, _ = PIPELINE_OPS[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h1 = result_hash(runner(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        h2 = result_hash(runner(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert h1 == h2, f"{name} output depends on partition count"


def test_fixture_aggregates_are_summation_order_safe(duck):
    """r10 float-flake rule: a PLANNER-path fixture may SUM/AVG only
    integer-typed columns -- partial sums of integers < 2^53 are exact
    doubles under ANY summation order, so every join order (and every
    shuffle merge order) hashes identically.  A SUM/AVG over a plain
    DOUBLE column accumulates representation error in plan-dependent
    order: runtime_test r10 caught left_deep/ikkbz hashing
    join_group_3's AVG(c_acctbal) differently from the other eight
    planners.  MIN/MAX/COUNT are order-safe on any type."""
    from query_optimizer_spark.sqlparse import parse
    from query_optimizer_spark.workload import FIXTURES

    sf = "/root/testdata/sf0.001"
    col_types: dict[tuple[str, str], str] = {}
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        for name, typ, *_ in duck.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        ).fetchall():
            col_types[(t, name)] = typ.upper()
    ok_types = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT"}
    for fixture, sql in FIXTURES.items():
        q = parse(sql)
        table_of = dict((a, t) for t, a in q.tables)
        for it in q.select:
            if it.agg not in ("sum", "avg"):
                continue
            typ = col_types[(table_of[it.col.alias], it.col.column)]
            assert typ in ok_types, (
                f"{fixture}: {it.agg}({it.col.alias}.{it.col.column}) "
                f"aggregates a {typ} column -- summation-order-dependent "
                "across planners; use an integer column or MIN/MAX/COUNT"
            )
