#!/usr/bin/env python3
"""Turn an IngestSoak per-job timeline (INGEST_JOB_TIMELINE_OUT) into
the FAIR slice-interleaving evidence: during each background-merge
window (the span of consecutive maintenance-pool jobs), how many
trigger-pool (default) jobs STARTED AND FINISHED inside the window,
and what their latencies looked like vs outside the windows.

The sliced-merge design claim (LshIndex.mergeStage): the FAIR
scheduler interleaves between JOBS, so cutting the O(corpus) merge
into bounded per-bucket slices lets trigger jobs run at slice
boundaries instead of queuing behind one monolithic all-cores job.
This script turns that from inference into measurement.

Usage: python3 tools/merge_interleave.py <timeline.jsonl> [out.json]
"""
import json, sys

def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    jobs = [json.loads(l) for l in open(path) if l.strip()]
    maint = sorted((j for j in jobs if j["pool"] == "maintenance"),
                   key=lambda j: j["start_ms"])
    trig = [j for j in jobs if j["pool"] != "maintenance"]
    # merge windows: consecutive maintenance jobs with < 5 s gaps
    windows = []
    for j in maint:
        if windows and j["start_ms"] - windows[-1][1] < 5000:
            windows[-1][1] = max(windows[-1][1], j["end_ms"])
            windows[-1][2] += 1
        else:
            windows.append([j["start_ms"], j["end_ms"], 1])
    def dur(j):
        return j["end_ms"] - j["start_ms"]
    inside, outside = [], []
    interleaved_per_window = []
    for j in trig:
        in_w = next((w for w in windows
                     if j["start_ms"] >= w[0] and j["end_ms"] <= w[1]), None)
        (inside if in_w else outside).append(dur(j))
    for w in windows:
        n = sum(1 for j in trig
                if j["start_ms"] >= w[0] and j["end_ms"] <= w[1])
        interleaved_per_window.append({
            "window_ms": w[1] - w[0], "slice_jobs": w[2],
            "trigger_jobs_started_and_finished_inside": n})
    def pct(xs, p):
        if not xs:
            return None
        s = sorted(xs)
        return s[int((len(s) - 1) * p)]
    doc = {
        "metric": "merge_slice_interleaving",
        "timeline": path,
        "merge_windows": len(windows),
        "total_slice_jobs": sum(w[2] for w in windows),
        "trigger_jobs_inside_windows": len(inside),
        "trigger_jobs_outside_windows": len(outside),
        "trigger_job_ms_inside": {
            "p50": pct(inside, 0.5), "p95": pct(inside, 0.95),
            "max": pct(inside, 1.0)},
        "trigger_job_ms_outside": {
            "p50": pct(outside, 0.5), "p95": pct(outside, 0.95),
            "max": pct(outside, 1.0)},
        "per_window": interleaved_per_window,
        "note": "a trigger job counted 'inside' started AND finished "
                "within a maintenance-pool merge window - the direct "
                "observation that the FAIR scheduler hands slots to "
                "trigger work at slice-job boundaries (the monolithic "
                "pre-r16 merge was ONE job, so this count was "
                "structurally ~0 during its windows)",
    }
    text = json.dumps(doc, indent=1) + "\n"
    if out:
        open(out, "w").write(text)
    print(text)

if __name__ == "__main__":
    main()
