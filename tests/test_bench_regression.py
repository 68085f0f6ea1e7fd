"""Per-query perf regression gate against the round-1 bench baseline.

Opt-in (timing-sensitive; skipped unless SPARK_GRAFT_BENCH_REGRESSION=1):
runs the headline suite via bench.py at sf0.1 and fails on any query
slower than 2x its BENCH_r01.json number (BASELINE.md table)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BENCH_REGRESSION") != "1",
    reason="opt-in perf gate: set SPARK_GRAFT_BENCH_REGRESSION=1",
)


def test_no_query_regressed_2x_vs_r01():
    # per-query baseline: BENCH_r01 numbers where they exist, BENCH_r02
    # for queries added after round 1 — every headline query is gated.
    with open(os.path.join(REPO, "BENCH_r01.json")) as f:
        base = json.load(f)["parsed"]["queries"]
    with open(os.path.join(REPO, "BENCH_r02.json")) as f:
        for q, sec in json.load(f)["parsed"]["queries"].items():
            base.setdefault(q, sec)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    now = json.loads(line)["queries"]
    slow = {
        q: (base[q], now[q])
        for q in base
        if q in now and now[q] > 2.0 * base[q] + 0.25  # +0.25s noise floor
    }
    assert not slow, f"queries >2x their r01 baseline: {slow}"
