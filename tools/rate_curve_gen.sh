#!/bin/bash
# Generational ingest rate curve (r16): step the IngestSoak feed rate
# under the GENERATIONAL loop (DocStream.ingestGen — hot-generation
# appends, metadata-only trigger path, background sliced merge) and
# record, per rate, whether the 15 s trigger SLO holds and whether
# state plateaus. This re-rates the engine's ingest capacity under the
# loop the scaladoc actually recommends for long-running streams — the
# previous rated figure (INGEST_RATE_CURVE.json, 20 k docs/s) was
# measured under the retired mono loop whose in-trigger O(corpus)
# compaction the generational design exists to remove.
#
# Protocol (the r14/r15 discipline, see VERDICT r15 + memory):
#   - tools/host_probe.py gates the attempt AND its reading is written
#     into the artifact (cross-day absolutes are only comparable
#     probe-to-probe);
#   - 45 s discarded JIT warmup, 150 s measured, 40 s watermark
#     (>= 2x watermark so the state plateau is observable);
#   - rotateEvery 3 + the default hotFractionPm 250 ratio gate — the
#     r15 A/B's winning policy.
#
# Usage: bash tools/rate_curve_gen.sh [rates...] (default: 15000 20000 25000 30000)
set -euo pipefail
cd /root/repo
RATES=("${@:-15000 20000 25000 30000}")
[ $# -eq 0 ] && RATES=(15000 20000 25000 30000)
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OUT=artifacts/INGEST_RATE_CURVE.json
TMP=$(mktemp -d)
echo "=== host probe (gate: parallel <= 1.4s ~ r14-day character +10%) ==="
python3 tools/host_probe.py 1.4 32 | tee "$TMP/probe_before.json"
for r in "${RATES[@]}"; do
  echo "=== rate $r docs/s (generational) ==="
  INGEST_GENERATIONAL=1 INGEST_ROTATE_EVERY=3 \
  INGEST_DOCS_PER_SEC=$r INGEST_SECONDS=150 INGEST_WATERMARK="40 seconds" \
  INGEST_WARMUP_SECONDS=45 \
  INGEST_SEEDS=10000 INGEST_OUT="$TMP/soakG_$r.jsonl" \
  INGEST_SUMMARY_OUT="$TMP/summary_$r.json" \
  java $ADD_OPENS -Xmx24g -cp "$CP" graft.IngestSoak 2>/dev/null | tail -1
  cp "$TMP/soakG_$r.jsonl" "knee_r16/soakGen_${r}_curve.jsonl" 2>/dev/null || true
  cp "$TMP/summary_$r.json" "knee_r16/soakGen_${r}_curve_summary.json" 2>/dev/null || true
done
python3 tools/host_probe.py 99 32 | tee "$TMP/probe_after.json" || true
python3 - "$TMP" "$OUT" "${RATES[@]}" <<'EOF'
import json, sys
tmp, out, rates = sys.argv[1], sys.argv[2], sys.argv[3:]
rows = []
for r in rates:
    d = json.load(open(f"{tmp}/summary_{r}.json"))
    rows.append({
        "feed_docs_per_sec": d["feed_docs_per_sec"],
        "median_docs_per_sec": d["median_docs_per_sec"],
        "batch_latency_p50_ms": d["batch_latency_p50_ms"],
        "batch_latency_p95_ms": d["batch_latency_p95_ms"],
        "batch_latency_max_ms": d["batch_latency_max_ms"],
        "state_rows_max": d["state_rows_max"],
        "state_plateau": d["state_plateau"],
        # p95, not max: a merge-window batch may legitimately run long;
        # the SLO question is whether ordinary batches hold the 15 s
        # contract (reference: the 15 s micro-batch)
        "holds_15s_trigger": d["batch_latency_p95_ms"] < 15000,
        "keeps_up_with_feed": d["median_docs_per_sec"] >= 0.95 * d["feed_docs_per_sec"],
    })
rated = max((r["feed_docs_per_sec"] for r in rows
             if r["holds_15s_trigger"] and r["keeps_up_with_feed"]),
            default=0)
doc = {"metric": "ingest_rate_curve",
       "loop": "generational (DocStream.ingestGen: hot appends, metadata-only "
               "trigger, background per-bucket-sliced merge, rotateEvery 3, "
               "hotFractionPm 250, FAIR maintenance pool weight 1/8)",
       "trigger_slo_ms": 15000,
       "watermark": "40 seconds",
       "seconds_per_rate": 150,
       "warmup_seconds": 45,
       "rated_docs_per_sec": rated,
       "host_probe_before": json.load(open(f"{tmp}/probe_before.json")),
       "host_probe_after": json.load(open(f"{tmp}/probe_after.json")),
       "mono_r14_reference": {
           "rated_docs_per_sec": 20000,
           "note": "the previous rated figure, measured r14 under the mono "
                   "loop (in-trigger compactEvery=6) on a host whose fixed-work "
                   "character the probes above are gated against; the mono "
                   "loop is retired for long-running streams (its compact cost "
                   "grows with stream lifetime - GEN_INGEST_AB_R15.json)"},
       "note": "rated = highest stepped feed rate whose p95 batch latency "
               "stays under the 15 s trigger AND whose median throughput "
               "keeps up with the feed (reference contract: the 15 s "
               "micro-batch). Generational loop: no in-trigger O(corpus) "
               "work at any corpus size; elevated batches are merge-window "
               "core contention, bounded by the FAIR pool weight and the "
               "r16 per-bucket merge slicing",
       "rates": rows}
open(out, "w").write(json.dumps(doc, indent=1) + "\n")
print(json.dumps(doc, indent=1))
EOF
