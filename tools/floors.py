"""Anchored loader for the consolidated per-query floors in BASELINE.md.

The CONSOLIDATED IN-SUITE FLOORS table is THE adjudication table (per
BASELINE.md): per-query min of min(warm, steady) over >=3 complete
bench.py suite runs.  Earlier floor tables in the file are engineering
history and must NOT pollute ratio diagnostics, so this parser anchors
to the consolidated section header and stops at its `**total**` row —
the fix for the round-8 ADVICE finding that a bare `| name | float |`
regex matched any 2-column numeric markdown row anywhere in the file.

Shared by bench.py (noise-retry trigger) and tools/merge_floors.py
(ratio diagnostics + new-floor fragments).
"""
from __future__ import annotations

import os
import re

_SECTION_HEADER = "## CONSOLIDATED IN-SUITE FLOORS"
_ROW_RE = re.compile(r"^\| (\w+) \| ([0-9]+\.[0-9]+) \|\s*$", re.M)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_BASELINE = os.path.join(_REPO_ROOT, "BASELINE.md")


def load_floors(baseline_path: str = DEFAULT_BASELINE) -> "dict[str, float]":
    """Per-query consolidated floors, anchored to the adjudication table.

    Returns {} (never raises) when the file or section is absent, so
    callers degrade to floor-less behavior instead of crashing a bench
    run on a checkout without BASELINE.md.
    """
    try:
        text = open(baseline_path).read()
    except OSError:
        return {}
    start = text.find(_SECTION_HEADER)
    if start == -1:
        return {}
    section = text[start:]
    # the table ends at its bolded total row; anything after is notes
    end = section.find("| **total** |")
    if end != -1:
        section = section[:end]
    return {m.group(1): float(m.group(2)) for m in _ROW_RE.finditer(section)}


if __name__ == "__main__":
    floors = load_floors()
    print(f"{len(floors)} floors, total {sum(floors.values()):.2f}s")
