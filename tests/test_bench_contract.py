"""bench.py's one-line JSON contract, which the driver parses blindly."""

import ast
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract(tmp_path):
    """Run bench.py against the tiny sf with 1 rep; the LAST stdout line
    must be one SCALARS-ONLY JSON object inside the driver's MEASURED
    2,000-byte capture window (VERDICT r7 #1: the r7 line was 2,052
    bytes because the per-query map was still on stdout -- it can never
    fit and grows every round), while the per-query best-of-reps map,
    raw per-rep timings, the plan/exec split and the adaptive phase
    decomposition land in the side artifact."""
    side = tmp_path / "bench_side.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_RAW_PATH=str(side),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        # 900 was sized for the ~75-query r7 headline; the r15 headline
        # is 141 queries + a ~20-step session warmup (measured 456 s
        # standalone at sf0.001, but the suite's live session fixtures
        # contend with the subprocess and this sandbox's I/O is noisy
        # to ~2x).  The contract under test is the stdout line, not a
        # latency SLA -- the timeout only guards against a hang.
        timeout=1800,
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
    assert headline and d["n_queries"] == len(headline)
    # the stdout line is scalars-only and stays WELL inside the
    # driver's measured 2,000-byte window, with headroom for value
    # digits -- NO per-query map on stdout, ever
    assert len(last) <= 1024, f"stdout line too long: {len(last)} bytes"
    assert "queries" not in d and "raw" not in d and "plan_sec" not in d
    # per-query best-of map + plan/exec split + raw timings + adaptive
    # decomposition in the side artifact instead
    side_doc = json.loads(side.read_text())
    assert set(side_doc["timings"]) == set(headline)
    # the contract-named alias the driver's per-query comparison reads
    # (VERDICT r15 #1: PERF came back n_common=0; "queries" is the
    # map's name in the driver contract) -- identical to "timings"
    assert side_doc["queries"] == side_doc["timings"]
    assert all(v > 0 for v in side_doc["timings"].values())
    assert abs(sum(side_doc["timings"].values()) - d["value"]) < 0.05
    assert side_doc["plan_sec"] and all(
        k.startswith("join_") and v >= 0
        for k, v in side_doc["plan_sec"].items()
    )
    assert set(side_doc["raw"]) == set(headline)
    assert all(len(ts) == 1 for ts in side_doc["raw"].values())
    for q in ("join_adaptive_reopt", "join_adaptive_full",
              "join_adaptive_outer"):
        (split,) = side_doc["adaptive_split"][q]
        assert split["rounds"] >= 1
        assert all(
            split[k] >= 0
            for k in ("plan_sec", "observe_sec", "replan_sec", "total_sec")
        )
    (csplit,) = side_doc["adaptive_split"]["dedup_survivors"]
    assert csplit["rounds"] >= 1 and csplit["setup_sec"] >= 0
    # no warning spew in the capture window: the JSON line must be the
    # ONLY stdout content, and FutureWarning text must not leak into
    # the window via stderr either (VERDICT r8 #4)
    assert "FutureWarning" not in out.stdout
    assert "FutureWarning" not in out.stderr[-4000:]


def test_stdout_writer_rejects_non_scalars():
    """The timings map can structurally never reach stdout: the single
    stdout writer rejects unknown keys and non-scalar values, so a
    refactor cannot re-inflate the line past the driver's capture
    window (VERDICT r8 #7)."""
    import pytest

    sys.path.insert(0, REPO)
    import bench

    ok = {
        "metric": "m", "value": 1.0, "unit": "sec",
        "n_queries": 90, "reps": 3, "cohorts": 3, "sf": 0.1,
    }
    line = bench.stdout_summary_line(ok)
    assert json.loads(line) == ok and len(line) <= 1024
    with pytest.raises(ValueError):  # per-query map smuggled in a value
        bench.stdout_summary_line({**ok, "value": {"q1": 1.0}})
    with pytest.raises(ValueError):  # per-query map as an extra key
        bench.stdout_summary_line({**ok, "queries": {"q1": 1.0}})
    with pytest.raises(ValueError):
        bench.stdout_summary_line({**ok, "timings": {"q1": 1.0}})
    # and main() has exactly ONE stdout print, going through the writer:
    # every print(...) without file= must call stdout_summary_line
    src = open(os.path.join(REPO, "bench.py")).read()
    tree = ast.parse(src)
    stdout_prints = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and getattr(node.func, "id", "") == "print"
            and not any(kw.arg == "file" for kw in node.keywords)
        ):
            stdout_prints.append(node)
    assert len(stdout_prints) == 1
    (call,) = stdout_prints
    arg = call.args[0]
    assert (
        isinstance(arg, ast.Call)
        and getattr(arg.func, "id", "") == "stdout_summary_line"
    )
