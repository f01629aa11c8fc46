#!/usr/bin/env python
"""Aggregate allQueryRuntimes.json -- drop-in analog of the reference's
analyze_runtimes.py (format {query: {planner: [ms, ...]}}; report = mean
of the LAST rep per planner across queries, analyze_runtimes.py:6-20).

Usage: python scripts/analyze_runtimes.py [allQueryRuntimes.json]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def analyze(data: dict[str, dict[str, list[float]]]) -> dict[str, float]:
    last_reps: dict[str, list[float]] = defaultdict(list)
    for _query, planners in data.items():
        for planner, runtimes in planners.items():
            if runtimes:
                last_reps[planner].append(runtimes[-1])
    return {
        planner: sum(vals) / len(vals) for planner, vals in last_reps.items()
    }


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "allQueryRuntimes.json"
    with open(path) as f:
        data = json.load(f)
    for planner, avg_ms in sorted(analyze(data).items(), key=lambda kv: kv[1]):
        print(f"{planner:20s} {avg_ms:10.1f} ms")


if __name__ == "__main__":
    main()
