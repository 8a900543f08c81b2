#!/usr/bin/env python3
"""Regenerate tools/bench_medians.tsv — the committed per-query medians
Bench's re-run-on-outlier policy compares against (sf0.1 only).

Usage: python3 tools/gen_bench_medians.py docs/BENCH_r16_run1.json [run2 run3 ...]

Each input is a full Bench detail JSON (bench_out.json shape); the
output median is taken across the runs' per-query medians. Re-run this
whenever a new committed 3-run battery replaces the old one, and commit
the tsv in the same change.
"""
import json, statistics, sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
if not runs:
    sys.exit("need at least one Bench detail JSON")
qs = sorted({q for r in runs for q in r["queries"]})
src = ", ".join(sys.argv[1:])
lines = [f"# query\tmedian_sec  (median across committed local runs: {src})"]
for q in qs:
    vals = [r["queries"][q] for r in runs if r["queries"].get(q, -1) >= 0]
    if vals:
        lines.append(f"{q}\t{statistics.median(vals):.3f}")
open("tools/bench_medians.tsv", "w").write("\n".join(lines) + "\n")
print(f"{len(lines)-1} medians -> tools/bench_medians.tsv")
