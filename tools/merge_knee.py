#!/usr/bin/env python3
"""Merge knee-sweep attempt summaries into artifacts/INGEST_RATE_CURVE.json.

Usage: python3 tools/merge_knee.py <sweep_dir>

For each rate found in <sweep_dir>/summary_<rate>_<attempt>.json, pick the
BEST attempt (holds-trigger-and-keeps-up first, then max median throughput
— the committed attempts_note protocol), convert it to a rate-curve row,
and merge it into the `rates` array (replacing any existing row for that
rate). Recomputes `rated_docs_per_sec` over the merged curve.
"""
import glob, json, re, sys

sweep = sys.argv[1]
curve_path = "artifacts/INGEST_RATE_CURVE.json"
curve = json.load(open(curve_path))

def green(s):
    return (s["batch_latency_p95_ms"] < 15000 and
            s["median_docs_per_sec"] >= 0.95 * s["feed_docs_per_sec"])

by_rate = {}
for f in sorted(glob.glob(f"{sweep}/summary_*_*.json")):
    rate = int(re.search(r"summary_(\d+)_\d+\.json", f).group(1))
    s = json.load(open(f))
    s["_attempts"] = by_rate.get(rate, {}).get("_attempts", 0) + 1
    cur = by_rate.get(rate)
    if (cur is None or
            (green(s), s["median_docs_per_sec"]) >
            (green(cur), cur["median_docs_per_sec"])):
        s["_attempts"] = max(s["_attempts"],
                             cur["_attempts"] if cur else 0)
        by_rate[rate] = s
    else:
        cur["_attempts"] = s["_attempts"]

for rate, s in sorted(by_rate.items()):
    row = {
        "feed_docs_per_sec": rate,
        "median_docs_per_sec": s["median_docs_per_sec"],
        "batch_latency_p50_ms": s["batch_latency_p50_ms"],
        "batch_latency_p95_ms": s["batch_latency_p95_ms"],
        "batch_latency_max_ms": s["batch_latency_max_ms"],
        "state_rows_max": s["state_rows_max"],
        "state_plateau": s["state_plateau"],
        "holds_15s_trigger": s["batch_latency_p95_ms"] < 15000,
        "keeps_up_with_feed":
            s["median_docs_per_sec"] >= 0.95 * rate,
        "attempts": s["_attempts"],
    }
    curve["rates"] = [r for r in curve["rates"]
                      if r["feed_docs_per_sec"] != rate] + [row]

curve["rates"].sort(key=lambda r: r["feed_docs_per_sec"])
rated = max((r["feed_docs_per_sec"] for r in curve["rates"]
             if r["holds_15s_trigger"] and r["keeps_up_with_feed"]),
            default=None)
curve["rated_docs_per_sec"] = rated
with open(curve_path, "w") as f:
    json.dump(curve, f, indent=1)
print(f"merged {len(by_rate)} rates; rated = {rated} docs/s")
for r in curve["rates"]:
    print(r["feed_docs_per_sec"], "median", r["median_docs_per_sec"],
          "p95", r["batch_latency_p95_ms"],
          "green", r["holds_15s_trigger"] and r["keeps_up_with_feed"])
