#!/usr/bin/env python3
"""Rebuild BASELINE.md's per-query range column from three cold-run
BENCH_RESULT.json files (dev tool; the re-record protocol in
.claude/skills/verify/SKILL.md). Reads the existing table to preserve the
notes column, replaces the range column with min-max of the three runs'
medians, prints the new table to stdout for manual splice.

Usage: python3 tools/rebuild_baseline_table.py run1.json run2.json run3.json
"""
import json
import re
import sys

runs = [json.load(open(p))["queries"] for p in sys.argv[1:4]]
names = sorted(runs[0].keys())

notes = {}
in_table = False
for line in open("BASELINE.md"):
    if line.startswith("| bench query |"):
        in_table = True
        continue
    if in_table:
        if not line.startswith("|"):
            break
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) >= 3 and cells[0].startswith("q"):
            notes[cells[0]] = cells[2]

total_lo = sum(min(r[q] for r in runs) for q in names)
print("| bench query | sec @ sf0.1 (local[32], r14 final x3) | notes |")
print("| --- | --- | --- |")
for q in names:
    vals = [r[q] for r in runs]
    lo, hi = min(vals), max(vals)
    rng = f"{lo:.1f}" if f"{lo:.1f}" == f"{hi:.1f}" else f"{lo:.1f}–{hi:.1f}"
    print(f"| {q} | {rng} | {notes.get(q, '')} |")
totals = [sum(v for v in r.values() if v >= 0) for r in runs]
print(f"| **total** | **{' / '.join(f'{t:.1f}' for t in totals)}** ({len(names)} queries) "
      f"| acceptance bar: driver total ≤ 2× of the recorded max "
      f"({max(totals):.1f} s) ⇒ ≤ ~{2*max(totals):.0f} s |")
