#!/usr/bin/env python3
"""Composition A/B for the bench warm-up protocol (round 15).

Usage: ab_compare.py <pool_runs_dir> <ab_runs_dir> <excluded_row> [pct]

Arm A = the headline pool (full registry, warm-up on). Arm B = sessions
run with SPARK_GRAFT_BENCH_EXCLUDE=<excluded_row> (same build, same sf,
warm-up on). Both arms are min-merged per row; the report lists every
row's A-vs-B movement, leading with the excluded row's known JIT-sharing
neighbors. PASS iff no shared row moves more than `pct` (default 5%)
plus a 0.05 s absolute floor (sub-100 ms rows flip whole percents on
scheduler jitter alone).
"""
import json
import os
import sys

pool_dir, ab_dir, excluded = sys.argv[1], sys.argv[2], sys.argv[3]
pct = float(sys.argv[4]) if len(sys.argv) > 4 else 5.0
ABS_FLOOR = 0.05

NEIGHBORS = ["sim_ann_lsh_capped_indexed", "sim_ann_lsh_index_delete",
             "sim_ann_lsh_search_filtered_auto", "sim_ann_lsh_search",
             "sim_ann_lsh_indexed", "sim_ann_lsh_capped", "sim_ann_lsh"]


def merged(d, build=None):
    qs = {}
    builds = set()
    n = 0
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json"):
            continue
        j = json.load(open(os.path.join(d, f)))
        if build is not None and j.get("build") != build:
            continue
        builds.add(j.get("build"))
        n += 1
        for q, t in j.get("queries", {}).items():
            if t >= 0:
                qs.setdefault(q, []).append(t)
    print(f"NOTE {d}: merged {n} sessions, builds={builds}")
    return {q: min(ts) for q, ts in qs.items()}, builds


# arm B's sessions are all on the current build; arm A (the headline
# pool dir) holds prior rounds' sessions too — filter A to B's build
b, b_builds = merged(ab_dir)
assert len(b_builds) == 1, f"arm B spans builds: {b_builds}"
a, _ = merged(pool_dir, build=next(iter(b_builds)))
if excluded in b:
    sys.exit(f"ERR: arm B contains the excluded row {excluded}")
shared = sorted(set(a) & set(b))
worst, fails = (None, 0.0), []
for q in shared:
    delta = (b[q] - a[q]) / a[q] * 100 if a[q] > 0 else 0.0
    tag = "NEIGHBOR" if q in NEIGHBORS else "row"
    if abs(delta) > abs(worst[1]):
        worst = (q, delta)
    moved = abs(delta) > pct and abs(b[q] - a[q]) > ABS_FLOOR
    if moved:
        fails.append(q)
    if q in NEIGHBORS or moved:
        print(f"{'MOVED' if moved else 'ok   '} {tag:8s} {q}: "
              f"A={a[q]:.3f}s B={b[q]:.3f}s ({delta:+.1f}%)")
print(f"-- {len(shared)} shared rows, worst movement {worst[0]} "
      f"{worst[1]:+.1f}%, {len(fails)} moved past {pct}%+{ABS_FLOOR}s")
print("PASS" if not fails else f"FAIL: {fails}")
sys.exit(1 if fails else 0)
