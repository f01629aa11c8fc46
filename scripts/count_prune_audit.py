#!/usr/bin/env python
"""Registry-wide count()-elimination audit (r14, VERDICT r13 #2).

bench.py and scripts/scale_probe.py drive operators through a bare
``df.count()``.  Catalyst legitimately ELIMINATES operators that
cannot change the row count when no downstream column needs them --
LEFT joins whose right side is unique on the join key, and trailing
Window functions (windows never change cardinality).  An op whose
plan collapses under count() is still CORRECT (the gate hashes all
columns, which pins the full plan) but its bench/SCALING timings
measure a plan that never does the op's work -- the r13 measurement
hazard, found by accident on 2 ops.  This script finds the whole
class: for every BATCH registry op it compares Join / Window /
Aggregate operator counts between ``df``'s executed plan and
``df.groupBy().count()``'s, and reports every op where Join or
Window counts DROP.

The fix for an offender is a row-level invariant filter on the output
referencing the otherwise-unused computed columns (see
dedup.substring_removal / temporal.gapfill_locf) -- it keeps every
consumer honest without changing any answer.

Usage: python scripts/count_prune_audit.py [--sf-dir DIR] [--out JSON]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KINDS = ("Join", "Window", "Aggregate")

# r15: operators whose presence in a count() plan proves row-level
# work still executes; a count() plan with NONE of them, no
# Join/Window, only the count's own aggregate pair, and a real FILE
# leaf has been pruned WHOLESALE to a bare scan count (the
# text_bpe_encode class -- pure projections have no Join/Window for
# the kind-count check to flag).  ExistingRDD/LocalTableScan leaves
# are exempt: the op materialized its result eagerly at call time, so
# timing is honest.  Matching is OPERATOR-NODE-anchored, not raw
# substring: every FileScan's metadata prints "DataFilters: [] ...
# PushedFilters: []", so a substring test for "Filter" is true on
# EVERY scan plan and a detector built on it can never fire (caught
# by the r15 self-review); likewise "Sort" would match SortAggregate
# / SortMergeJoin.  A work operator appears at the start of a tree
# line -- only tree-drawing characters (space + - * : ( ) digits
# brackets) precede it -- and is followed by a space, '(', '[', or
# end of line (bare "Union").
WORK_MARKER_RE = re.compile(
    r"(?m)^[^A-Za-z]*"
    r"(?:Filter|Generate|Expand|Sample|Union|Sort|"
    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)"
    r"(?:[ (\[]|$)"
)


def plan_counts(plan: str) -> dict[str, int]:
    return {k: len(re.findall(k, plan)) for k in KINDS}


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def bare_scan_count(cnt_plan: str) -> bool:
    return (
        not re.search("Join|Window", cnt_plan)
        and len(re.findall("Aggregate", cnt_plan)) <= 2
        and not WORK_MARKER_RE.search(cnt_plan)
        and "ExistingRDD" not in cnt_plan
        and "LocalTableScan" not in cnt_plan
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="COUNT_PRUNE.json")
    args = ap.parse_args()

    from query_optimizer_spark.functions.registry import PIPELINE_OPS
    from query_optimizer_spark.session import get_session

    spark = get_session("count-prune-audit", profile="default")
    rows: dict[str, dict] = {}
    offenders = []
    for name in sorted(PIPELINE_OPS):
        if name.startswith("stream_"):
            continue  # streaming sinks aren't driven via count()
        t0 = time.monotonic()
        try:
            df = PIPELINE_OPS[name][0](spark, args.sf_dir)
            full = plan_counts(plan_str(df))
            cnt_plan = plan_str(df.groupBy().count())
            cnt = plan_counts(cnt_plan)
        except Exception as exc:  # pragma: no cover
            rows[name] = {"err": str(exc)[:200]}
            continue
        dropped = {
            k: (full[k], cnt[k])
            for k in ("Join", "Window")
            if cnt[k] < full[k]
        }
        bare = bare_scan_count(cnt_plan)
        rows[name] = {
            "full": full,
            "count": cnt,
            "dropped": dropped,
            "bare_scan": bare,
            "sec": round(time.monotonic() - t0, 2),
        }
        if dropped or bare:
            offenders.append(name)
            print(f"DROP {name}: {dropped or 'bare-scan count()'}")
    with open(args.out, "w") as f:
        json.dump(
            {"offenders": offenders, "ops": rows}, f, indent=1, sort_keys=True
        )
    print(
        f"wrote {args.out}: {len(rows)} batch ops audited,"
        f" {len(offenders)} with Join/Window pruned under count():"
        f" {offenders}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
