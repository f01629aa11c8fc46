"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Runs with the 'default' profile (AQE on, auto-broadcast on) -- the
configuration a real cluster would use; the planner still picks the join
order (SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

    import __spark_entry__ as entrymod
    from query_optimizer_spark import workload
    from query_optimizer_spark.session import get_session

    spark = get_session("spark-joinlab-bench", profile="default", cpus=cpus)
    # headline set: every operator family (planner joins, SQL surface,
    # dedup, similarity, text, temporal, streaming)
    headline = [
        "join_chain_3", "join_star_4", "join_cycle_7", "join_cross_2",
        "join_selfjoin_4", "join_preds_3", "join_events_8", "join_group_3",
        "join_outer_3", "join_outer_removed",
        "sql_agg_pricing", "sql_window_rank", "sql_q5_local_revenue",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "dedup_embedding_cosine",
        "sim_bruteforce_topk", "sim_lsh_ann_topk", "sim_ivf_topk",
        "text_token_count", "text_quality_score", "text_fingerprint",
        "text_bigram_topk", "skew_salted_join",
        "evt_hourly_rollup", "evt_sessionize", "evt_asof_join",
        "stream_hourly_counts",
        "corpus_vocab_topk", "corpus_tfidf_topk", "corpus_curate",
        "text_repetition_stats", "corpus_pack_sequences",
        "corpus_filter_funnel", "evt_retention_cohorts",
        "corpus_chunk_overlap", "evt_anomaly_hours", "corpus_score_model",
        # r4/r5 additions: containment dedup, grouped ranking, OOV rate,
        # learned-policy planning, data mixing, sharding, diversity
        "dedup_containment", "evt_hourly_topk", "text_oov_bigram_rate",
        "join_env_learned", "corpus_mix_weighted", "corpus_shuffle_shard",
        "text_token_diversity", "corpus_boilerplate",
        "evt_transition_matrix", "emb_norm_stats",
    ]
    try:
        all_qs = entrymod.queries()
        qs = {name: all_qs[name] for name in headline}
        timings: dict[str, float] = {}
        plan_secs: dict[str, float] = {}
        # warm the JVM/codegen path once with the cheapest query
        warm = all_qs["join_cross_2"](spark, sf_dir)
        warm.collect()
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
        for name, fn in qs.items():
            best = None
            for _ in range(reps):
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                n = df.count() if df.isStreaming is False else -1
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                assert n >= 0
            timings[name] = round(best, 4)
            # planning-vs-execution split for planner-pipeline queries:
            # time the planning slice alone (same oracle construction
            # as the runner), so a total-time regression is attributable
            # to plan time vs Spark execution (VERDICT r4 #3)
            if name in entrymod._FIXTURE_PLANNERS:
                planner = entrymod._FIXTURE_PLANNERS[name]
                best_p = None
                for _ in range(reps):
                    t0 = time.monotonic()
                    oracle = (
                        workload.true_oracle(sf_dir)
                        if name in entrymod._TRUE_ORACLE_FIXTURES
                        else None
                    )
                    workload.plan_fixture(
                        sf_dir, name, planner=planner, oracle=oracle
                    )
                    dt = time.monotonic() - t0
                    best_p = dt if best_p is None else min(best_p, dt)
                plan_secs[name] = round(best_p, 4)
        total = round(sum(timings.values()), 4)
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_runtime",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "plan_sec": plan_secs,
                    "reps": reps,
                    "sf": sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
