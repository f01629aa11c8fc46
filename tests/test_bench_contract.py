"""bench.py's one-line JSON contract, which the driver parses blindly."""

import ast
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    """Run bench.py against the tiny sf with 1 rep; the LAST stdout line
    must be one JSON object with the driver-required keys, every
    headline query present with a positive float, and plan/exec split
    recorded for the join fixtures."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        check=True,
    )
    last = out.stdout.strip().splitlines()[-1]
    d = json.loads(last)
    assert d["unit"] == "sec" and d["metric"]
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert d["reps"] == 1
    # headline list in bench.py matches the emitted queries exactly
    src = open(os.path.join(REPO, "bench.py")).read()
    tree = ast.parse(src)
    headline = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and getattr(
            node.targets[0], "id", ""
        ) == "headline":
            headline = [ast.literal_eval(e) for e in node.value.elts]
    assert headline and set(d["queries"]) == set(headline)
    assert all(v > 0 for v in d["queries"].values())
    assert abs(sum(d["queries"].values()) - d["value"]) < 0.01
    # plan/exec split present for every planner fixture in the headline
    assert d["plan_sec"] and all(
        k.startswith("join_") and v >= 0 for k, v in d["plan_sec"].items()
    )
