"""Compute the NEXT round's certification front block.

The driver's correctness gate certifies ~50 queries per round in
registration order.  This tool reads every CORRECTNESS_r*.json in the
repo root, classifies each registered query (green / rows-only / failed
/ never-checked), and prints the two ordered name lists to paste into
``vtb_datafusion_2023_spark/suite/__init__.py`` (``_FRONT_R{N}`` /
``_UNCHECKED_TAIL``): failed queries first (they need a green row),
then never-checked queries in current registration order, then the
already-certified remainder keeps its relative order automatically.

Usage:
    PYTHONPATH=/root/repo python tools/plan_next_round.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from vtb_datafusion_2023_spark import suite

    names = list(suite.queries())
    # the LATEST driver row per query decides its status: a later green
    # supersedes an old failure AND a later failure supersedes an old
    # green (a regression must re-enter the front block)
    status: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            status[name] = row.get("hash_match") is True or row.get("err") == "no_oracle"
    green = {n for n, ok in status.items() if ok}
    failed = {n for n, ok in status.items() if not ok}
    never = [n for n in names if n not in green and n not in failed]
    front = [n for n in names if n in failed] + never
    certified = [n for n in names if n in green and n not in failed]

    print(f"# registered: {len(names)}  green: {len(green)}  "
          f"failed-without-green: {len(failed)}  never-checked: {len(never)}")
    print(f"# next front block ({len(front)} names; driver covers ~50/round):")
    for i in range(0, len(front), 3):
        print("    " + " ".join(f'"{n}",' for n in front[i : i + 3]))
    print(f"# certified tail keeps registration order ({len(certified)} names)")
    if not front:
        print("# every registered query has a green (or rows-only) driver row.")


if __name__ == "__main__":
    main()
