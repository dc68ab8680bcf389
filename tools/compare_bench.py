#!/usr/bin/env python3
"""Diff two bench artifacts with host-probe normalization.

Usage: python3 tools/compare_bench.py <bench_a.json> <bench_b.json> [top_n]

Prints the probe ratio (B's fixed-work cost over A's) and the queries
whose min-of-N ratio deviates most from it. The point (r14/r15 budget
postmortem): a host that is uniformly k-times slower moves every
compute-bound query by ~k — so "regressed" is a per-query ratio well
PAST the probe ratio, not past 1.0. Queries missing from either side
are listed, not silently dropped.
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
top = int(sys.argv[3]) if len(sys.argv) > 3 else 15

am, bm = a.get("mins") or a["queries"], b.get("mins") or b["queries"]
pa, pb = a.get("host_probe"), b.get("host_probe")
if pa and pb:
    pr = pb["parallel_sec"] / pa["parallel_sec"]
    print(f"host probe: A parallel {pa['parallel_sec']}s, B parallel "
          f"{pb['parallel_sec']}s -> B/A = {pr:.2f} "
          f"(single: {pb['single_sec']/pa['single_sec']:.2f})")
else:
    pr = None
    print("host probe: missing on one side (pre-r15 artifact) - "
          "ratios below are UN-normalized")

common = sorted(set(am) & set(bm))
ratios = [(bm[q] / am[q] if am[q] > 0 else float("inf"), q) for q in common]
tot_a, tot_b = sum(am[q] for q in common), sum(bm[q] for q in common)
print(f"common queries: {len(common)}; total min-sum A {tot_a:.1f}s, "
      f"B {tot_b:.1f}s (B/A {tot_b/tot_a:.2f})")
for side, missing in (("only in A", set(am) - set(bm)),
                      ("only in B", set(bm) - set(am))):
    if missing:
        print(f"{side}: {', '.join(sorted(missing))}")
print(f"\nlargest B/A ratios (suspect past the probe ratio"
      f"{f' {pr:.2f}' if pr else ''}, with a >1s absolute delta):")
for r, q in sorted(ratios, reverse=True)[:top]:
    flag = " <-- regressed?" if (pr and r > max(2.0, 1.5 * pr)
                                 and bm[q] - am[q] > 1.0) else ""
    print(f"  {q}: {am[q]:.2f}s -> {bm[q]:.2f}s ({r:.2f}x){flag}")
