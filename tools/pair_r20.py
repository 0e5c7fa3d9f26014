#!/usr/bin/env python3
"""Fold the six interleaved bench legs (old/new x 3) into
BENCH_PAIRED_r20.json: per-query min across each binary's three legs,
then the median new/old ratio — the same design as BENCH_PAIRED_r19.
"""
import json
import statistics

BASE = "target/paired_r20"


def leg(side, i):
    with open(f"{BASE}/{side}_leg{i}.json") as f:
        return json.load(f)


def mins(side):
    legs = [leg(side, i) for i in (1, 2, 3)]
    qs = [l.get("mins") or l["queries"] for l in legs]
    common = set(qs[0])
    for q in qs[1:]:
        common &= set(q)
    return {q: min(x[q] for x in qs) for q in common
            if all(x[q] > 0 for x in qs)}


old, new = mins("old"), mins("new")
common = sorted(set(old) & set(new))
ratios = {q: round(new[q] / old[q], 3) for q in common}
med = round(statistics.median(ratios.values()), 3)
sum_old = round(sum(old[q] for q in common), 1)
sum_new = round(sum(new[q] for q in common), 1)
out = {
    "metric": "paired_bench_r20",
    "design": ("interleaved same box, six full drills (A,B,A,B,A,B; "
               "A=r19 commit fcb809e built in a worktree, B=r20 HEAD); "
               "per-query min across a binary's three legs, then ratio "
               "r20/r19"),
    "common_queries": len(common),
    "median_minofboth_ratio": med,
    "sum_of_mins_new_sec": sum_new,
    "sum_of_mins_old_sec": sum_old,
    "sum_ratio": round(sum_new / sum_old, 3),
    "per_query_ratio": ratios,
    "noise_calibration": ("FIELDID_AB_r17.json: same-binary interleaved "
                          "paired medians swing 0.89-1.15 on this box; a "
                          "median inside that band distinguishes nothing"),
}
with open("BENCH_PAIRED_r20.json", "w") as f:
    json.dump(out, f, indent=1)
print("median", med, "sum_ratio", out["sum_ratio"], "n", len(common))
worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
best = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
print("worst:", worst)
print("best:", best)
