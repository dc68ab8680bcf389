#!/usr/bin/env python3
"""Regenerate artifacts/BENCH_BUDGET.json from a DRIVER-host basis.

Usage:
  python3 tools/cut_budget_driver.py <driver_bench_json> <local_new_json> \
      <local_old_bench_json> --changed q1,q2,... [source_note]

Round-15 budget protocol. The r14 record proved per-query budgets cut
on the builder host do NOT transfer to the driver host for per-row-
compute-heavy queries (4 violations at 2.6-4.4x with every plan
unchanged and the builder-local run green). The honest basis is the
driver's own last recorded bench — the same host class the budgets are
asserted against (BenchBudgetSpec reads BENCH_driver.json).

For queries the builder CHANGED this round (--changed, an explicit
list — ratios on UNCHANGED queries are host noise, not signal), the
driver value is stale; same-host RATIOS transfer even when absolutes
don't, so those budgets are scaled:
budget = driver_old_min * (local_new_min / local_old_min), applied
when the ratio moves more than 10% — everything else keeps the driver
figure.
Queries new this round have no driver basis and are SKIPPED (the
tripwire ignores missing budgets; they get one next round).
"""
import json, sys

args = list(sys.argv[1:])
changed = set()
if "--changed" in args:
    i = args.index("--changed")
    changed = set(args[i + 1].split(","))
    del args[i:i + 2]
driver = json.load(open(args[0]))
local_new = json.load(open(args[1]))
local_old = json.load(open(args[2]))

# every ratio input must be a BENCH ARTIFACT from the same (builder)
# host — a budget file is driver-basis numbers, and a local/driver
# ratio is exactly the cross-host comparison whose non-transferability
# this tool exists to avoid (r14 postmortem). Bench artifacts carry
# "mins" (r13+) or at least "host_probe" (r15+); budget files carry
# "source" and neither.
for label, d in (("local_new", local_new), ("local_old", local_old)):
    assert "mins" in d or "host_probe" in d, (
        f"{label} must be a bench artifact (has 'mins'/'host_probe'), "
        "not a budget file: same-host ratios are the whole premise")

driver_mins = driver.get("mins") or driver["queries"]
new_mins = local_new.get("mins") or local_new["queries"]
old_mins = local_old.get("mins") or local_old["queries"]

note = args[3] if len(args) > 3 else (
    "driver-host r14 min-of-3 (BENCH_driver.json) - the host class "
    "BenchBudgetSpec asserts against; queries changed in r15 scaled by "
    "the builder-local min ratio (same-host ratios transfer, absolutes "
    "don't - see r14 budget violations postmortem)")

out_q, scaled, kept, skipped = {}, [], [], []
for name, d in sorted(driver_mins.items()):
    if name not in new_mins:
        continue  # query removed
    ratio = None
    if name in changed and name in old_mins and old_mins[name] > 0:
        ratio = new_mins[name] / old_mins[name]
    if ratio is not None and abs(ratio - 1.0) > 0.10:
        out_q[name] = round(d * ratio, 3)
        scaled.append((name, round(d, 3), out_q[name], round(ratio, 2)))
    else:
        out_q[name] = round(d, 3)
        kept.append(name)
for name in sorted(new_mins):
    if name not in driver_mins:
        skipped.append(name)

out = {
    "source": note,
    "tolerance": "flagged when recorded min-of-N > 2x budget AND "
                 "exceeds it by > 1 s (BenchBudgetSpec / Bench budget_violations)",
    "queries": out_q,
}
# carry the basis host's fixed-work fingerprint so BenchBudgetSpec can
# print the artifact/basis probe ratio inside any violation message
if driver.get("host_probe"):
    out["basis_host_probe"] = driver["host_probe"]
    out["basis_host_probe_note"] = (
        "fixed-work fingerprint of the driver bench these budgets were cut "
        "from (graft.Bench hostProbe: seconds for a 100M-iteration integer "
        "spin, single-thread and N-way)")
with open("artifacts/BENCH_BUDGET.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {len(out_q)} budgets ({len(kept)} driver-basis, "
      f"{len(scaled)} ratio-scaled, {len(skipped)} new-no-budget)")
for s in scaled:
    print(f"  scaled {s[0]}: driver {s[1]} -> {s[2]} (local ratio {s[3]})")
for s in skipped:
    print(f"  skipped (new): {s}")
