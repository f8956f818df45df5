#!/usr/bin/env python3
"""Wall ratios of a scaled min-merged pool against the 1x headline pool.

Usage: scale_ratios.py <bench_out_1x.json> <bench_out_xN.json> <N> [family...]

Prints per-row scaled/1x wall ratios (the SCALING.md slope evidence),
grouped worst-first, with the row factor for reference. Families filter
by prefix when given (e.g. `events_ dedup_`).
"""
import json
import sys

one = json.load(open(sys.argv[1]))["queries"]
sca = json.load(open(sys.argv[2]))["queries"]
n = float(sys.argv[3])
prefixes = sys.argv[4:]

rows = []
for q in sorted(set(one) & set(sca)):
    if prefixes and not any(q.startswith(p) for p in prefixes):
        continue
    if one[q] > 0 and sca[q] > 0:
        rows.append((sca[q] / one[q], q, one[q], sca[q]))
rows.sort(reverse=True)
for r, q, a, b in rows:
    mark = "SUPER" if r > n else ("~lin " if r > 0.8 * n else "sub  ")
    print(f"{mark} {q:42s} 1x={a:8.3f}s x{n:g}={b:8.3f}s ratio={r:6.2f}x")
sub = sum(1 for r, *_ in rows if r <= 0.8 * n)
print(f"-- {len(rows)} rows vs row factor {n:g}x: "
      f"{sub} sub-linear, {sum(1 for r,*_ in rows if r > n)} super-linear")
