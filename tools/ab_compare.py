#!/usr/bin/env python3
"""Composition A/B for the bench warm-up protocol (round 15).

Usage: ab_compare.py <pool_runs_dir> <ab_runs_dir> <excluded_row> [pct]

Arm A = the headline pool (full registry, warm-up on). Arm B = sessions
run with SPARK_GRAFT_BENCH_EXCLUDE=<excluded_row> (same build, same sf,
warm-up on). The report lists every row's A-vs-B movement, leading with
the excluded row's known JIT-sharing neighbors. PASS iff no shared row
moves more than `pct` (default 5%) plus a 0.05 s absolute floor
(sub-100 ms rows flip whole percents on scheduler jitter alone).

EQUAL-DEPTH comparison (round 16): min-merge depth biases rows downward
as sessions pile up, so a deep arm A vs a shallow arm B reads as B
"regressing" on unrelated rows (the round-15 SCALING.md note measured
+9-25% of pure depth bias). When the arms differ in session count, the
deeper arm is SUBSAMPLED to the shallower depth over up to MAX_COMBOS
deterministic session combinations and each row compares against the
MEDIAN of those equal-depth min-merges — the honest test the r15 doc
ran by hand as C(8,4) sub-pools.
"""
import itertools
import json
import os
import statistics
import sys

pool_dir, ab_dir, excluded = sys.argv[1], sys.argv[2], sys.argv[3]
pct = float(sys.argv[4]) if len(sys.argv) > 4 else 5.0
ABS_FLOOR = 0.05
MAX_COMBOS = 256

NEIGHBORS = ["sim_ann_lsh_capped_indexed", "sim_ann_lsh_index_delete",
             "sim_ann_lsh_search_filtered_auto", "sim_ann_lsh_search",
             "sim_ann_lsh_indexed", "sim_ann_lsh_capped", "sim_ann_lsh"]


def sessions(d, build=None):
    """Per-session {row: sec} dicts (valid rows only) + builds seen."""
    out, builds = [], set()
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json"):
            continue
        j = json.load(open(os.path.join(d, f)))
        if build is not None and j.get("build") != build:
            continue
        builds.add(j.get("build"))
        out.append({q: t for q, t in j.get("queries", {}).items() if t >= 0})
    print(f"NOTE {d}: {len(out)} sessions, builds={builds}")
    return out, builds


def min_merge(sess):
    qs = {}
    for s in sess:
        for q, t in s.items():
            qs.setdefault(q, []).append(t)
    return {q: min(ts) for q, ts in qs.items()}


def equal_depth_baseline(deep, depth):
    """Median per-row min-merge over deterministic depth-sized
    combinations of the deeper arm's sessions.

    When C(n, depth) exceeds MAX_COMBOS, STRIDE evenly through the
    enumeration instead of taking the lexicographic prefix: the prefix
    over-represents the earliest sessions (at 16-deep vs 8-shallow,
    every one of the first 256 combos contains sessions 0 and 1 since
    C(14,6) > 256), biasing the median toward early-session timings.
    An even stride keeps the sample deterministic while spreading it
    across the whole combination space."""
    import math
    total = math.comb(len(deep), depth)
    if total <= MAX_COMBOS:
        combos = itertools.combinations(range(len(deep)), depth)
        n_note = f"all {total}"
    else:
        stride = total / MAX_COMBOS
        wanted = {int(i * stride) for i in range(MAX_COMBOS)}
        combos = (c for i, c in enumerate(
            itertools.combinations(range(len(deep)), depth)) if i in wanted)
        n_note = f"{len(wanted)} evenly-strided of {total}"
    per_row = {}
    n = 0
    for c in combos:
        n += 1
        for q, t in min_merge([deep[i] for i in c]).items():
            per_row.setdefault(q, []).append(t)
    print(f"NOTE equal-depth: {n} ({n_note}) C({len(deep)},{depth}) "
          f"sub-pools, per-row MEDIAN of sub-pool min-merges")
    return {q: statistics.median(ts) for q, ts in per_row.items()}


# arm B's sessions are all on the current build; arm A (the headline
# pool dir) holds prior rounds' sessions too — filter A to B's build
b_sess, b_builds = sessions(ab_dir)
assert len(b_builds) == 1, f"arm B spans builds: {b_builds}"
a_sess, _ = sessions(pool_dir, build=next(iter(b_builds)))
assert a_sess and b_sess, "an arm is empty"

if len(a_sess) == len(b_sess):
    a, b = min_merge(a_sess), min_merge(b_sess)
elif len(a_sess) > len(b_sess):
    a = equal_depth_baseline(a_sess, len(b_sess))
    b = min_merge(b_sess)
else:
    a = min_merge(a_sess)
    b = equal_depth_baseline(b_sess, len(a_sess))

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
