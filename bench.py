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

    import __spark_entry__ as entrymod
    from query_optimizer_spark.session import get_session

    spark = get_session("spark-joinlab-bench", profile="default", cpus=cpus)
    try:
        qs = entrymod.queries()
        timings: dict[str, float] = {}
        # warm the JVM/codegen path once with the cheapest query
        warm = entrymod.queries()["join_cross_2"](spark, sf_dir)
        warm.collect()
        for name, fn in qs.items():
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count() if df.isStreaming is False else -1
            timings[name] = round(time.monotonic() - t0, 4)
            assert n >= 0
        total = round(sum(timings.values()), 4)
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_runtime",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
