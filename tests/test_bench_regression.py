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
    # per-query baseline: earliest recorded BENCH_rN number per query —
    # queries added in later rounds enter the gate with their first
    # driver-recorded round as the ceiling.
    import glob

    base: dict = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            rec = json.load(f).get("parsed") or {}
        for q, sec in (rec.get("queries") or {}).items():
            base.setdefault(q, sec)
    assert base, "no BENCH_r*.json baselines found"
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
