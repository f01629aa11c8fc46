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
