"""Merge N BENCH_DETAIL.json samples into per-query floors.

Usage: python tools/merge_floors.py bench_floors_r8/run1.json [run2.json ...]

Prints the per-query min of min(warm, steady) across runs (the
consolidated-floor methodology from BASELINE.md), a markdown floor
table fragment, and ratio-vs-existing-floor diagnostics for queries
already in BASELINE.md's consolidated table.
"""
from __future__ import annotations

import json
import re
import sys


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    names = list(runs[0]["queries"])
    floors = {}
    for n in names:
        samples = []
        for r in runs:
            s = r["samples"][n]
            samples.append(min(s["warm"], s["steady"]))
        floors[n] = min(samples)

    existing = {}
    try:
        text = open("BASELINE.md").read()
        # take the LAST consolidated table occurrence of each query
        for m in re.finditer(r"^\| (\w+) \| ([0-9.]+) \|$", text, re.M):
            existing[m.group(1)] = float(m.group(2))
    except OSError:
        pass

    total = sum(floors.values())
    print(f"# merged floors over {len(runs)} runs — {len(names)} queries, "
          f"total {total:.2f}s")
    worst = []
    for n in names:
        if n in existing:
            ratio = floors[n] / existing[n] if existing[n] else float("inf")
            worst.append((ratio, n))
    worst.sort(reverse=True)
    print("\n## worst ratios vs existing floors (new-run floor / recorded)")
    for ratio, n in worst[:12]:
        print(f"  {n}: {ratio:.2f}x ({floors[n]:.2f} vs {existing[n]:.2f})")

    print("\n## markdown rows for queries WITHOUT an existing floor")
    for n in names:
        if n not in existing:
            print(f"| {n} | {floors[n]:.2f} |")


if __name__ == "__main__":
    main()
