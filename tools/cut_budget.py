#!/usr/bin/env python3
"""Regenerate artifacts/BENCH_BUDGET.json from a clean local bench run.

Usage: python3 tools/cut_budget.py <bench_json> [source_note]

Budgets are the per-query MIN-of-N from the given run (the
noise-robust figure BenchBudgetSpec and Bench's budget_violations
compare against — see the round-13 min-of-N protocol in README).
"""
import json, sys

bench = json.load(open(sys.argv[1]))
src = sys.argv[2] if len(sys.argv) > 2 else \
    "clean local 3-rep bench at sf0.1 local[32] (min-of-N per query)"
mins = bench.get("mins") or bench["queries"]
out = {
    "source": src,
    "tolerance": "flagged when recorded min-of-N > 2x budget AND "
                 "exceeds it by > 1 s (BenchBudgetSpec / Bench budget_violations)",
    "queries": {k: round(v, 3) for k, v in sorted(mins.items())},
}
with open("artifacts/BENCH_BUDGET.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {len(out['queries'])} budgets from {sys.argv[1]}")
