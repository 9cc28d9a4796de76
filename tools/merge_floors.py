"""Merge N BENCH_DETAIL.json samples into per-query floors.

Usage: python tools/merge_floors.py bench_floors_r9/run1.json [run2.json ...]

Prints the per-query min of min(warm, steady) across runs (the
consolidated-floor methodology from BASELINE.md), a markdown floor
table fragment, and ratio-vs-existing-floor diagnostics against the
CONSOLIDATED IN-SUITE FLOORS table only (anchored parse via
tools/floors.py — earlier historical tables no longer pollute ratios).
Runs with differing query sets are intersected, with dropped names
reported, instead of raising KeyError on partial runs.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from floors import load_floors  # noqa: E402


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    names = list(runs[0]["queries"])
    common = [n for n in names if all(n in r["samples"] for r in runs)]
    dropped = sorted(set(names) - set(common))
    for i, r in enumerate(runs[1:], start=2):
        extra = sorted(set(r["samples"]) - set(names))
        if extra:
            print(f"# WARNING: run{i} has {len(extra)} queries absent from "
                  f"run1 (ignored): {extra}")
    if dropped:
        print(f"# WARNING: {len(dropped)} run1 queries missing from a later "
              f"run — floors computed over the intersection only: {dropped}")

    floors = {}
    for n in common:
        floors[n] = min(
            min(r["samples"][n]["warm"], r["samples"][n]["steady"]) for r in runs
        )

    existing = load_floors()

    total = sum(floors.values())
    print(f"# merged floors over {len(runs)} runs — {len(common)} queries, "
          f"total {total:.2f}s")
    worst = sorted(
        ((floors[n] / existing[n] if existing[n] else float("inf")), n)
        for n in common
        if n in existing
    )
    print("\n## worst ratios vs consolidated floors (new-run floor / recorded)")
    for ratio, n in reversed(worst[-12:]):
        print(f"  {n}: {ratio:.2f}x ({floors[n]:.2f} vs {existing[n]:.2f})")

    print("\n## markdown rows for queries WITHOUT a consolidated floor")
    for n in common:
        if n not in existing:
            print(f"| {n} | {floors[n]:.2f} |")


if __name__ == "__main__":
    main()
