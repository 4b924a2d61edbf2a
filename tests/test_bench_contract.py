"""bench.py driver contract: exactly one JSON line on stdout with the
required keys (run at the smallest scale factor to keep it fast)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_one_json_line():
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4",
               # single timed pass, no warmup: the contract under test
               # is the output shape, not steady-state timing
               SPARK_GRAFT_BENCH_RUNS="1",
               SPARK_GRAFT_BENCH_WARMUP="0")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, timeout=480, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be exactly one line: {lines}"
    # the driver records only the last ~2000 stdout chars; the line
    # must fit that window or the parsed record is lost (BENCH_r06)
    assert len(lines[0]) <= 2000, f"stdout line too long: {len(lines[0])}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float))
    assert payload["queries"] and all(
        isinstance(v, (int, float)) for v in payload["queries"].values())
    # full per-query fidelity lives in bench_out.json; the stdout map
    # is the slowest-first subset of it that fits the byte budget
    full = json.loads((REPO / "bench_out.json").read_text())
    assert abs(sum(full["queries"].values()) - payload["value"]) < 0.1
    assert payload["n_queries"] == len(full["queries"])
    assert payload["queries_omitted"] == (
        len(full["queries"]) - len(payload["queries"]))
    for name, sec in payload["queries"].items():
        assert full["queries"][name] == sec
