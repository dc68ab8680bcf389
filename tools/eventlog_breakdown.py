#!/usr/bin/env python3
"""Per-query time breakdown from a Spark event log.

Usage: eventlog_breakdown.py <eventlog-file> [--jobs]

Prints, for the application: total wall, sum of job wall times, and the
driver-side gap (wall not covered by any running job — planning,
catalog/FS metadata, collect post-processing). With --jobs, prints each
job's wall time, its description (setJobDescription / callsite), stage
count and task count, so the expensive jobs of a lifecycle query are
attributable to the exact operator stage that launched them.

Measurement-first discipline (guide §1): this distinguishes "the
executors are busy" (optimize the plan) from "the driver is thinking"
(remove jobs/actions, shrink the plan) — at sf0.1's data sizes the
latter dominates most registry queries, which is exactly what this
tool exists to prove per query.
"""
import json, os, sys

def event_lines(path):
    """Yield event-json lines from a file or a Spark 4 rolling log dir."""
    if os.path.isdir(path):
        parts = sorted(p for p in os.listdir(path) if p.startswith("events_"))
        for p in parts:
            with open(os.path.join(path, p)) as f:
                yield from f
    else:
        with open(path) as f:
            yield from f

def main():
    path = sys.argv[1]
    show_jobs = "--jobs" in sys.argv
    jobs = {}          # id -> dict(start, end, desc, stages, tasks)
    stage_tasks = {}   # stage id -> task count
    app_start = app_end = None
    for line in event_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif t == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description") or \
                    props.get("callSite.short", "")
                jobs[jid] = dict(jid=jid, start=ev["Submission Time"], end=None,
                                 desc=desc[:120],
                                 stages=len(ev.get("Stage Infos", [])),
                                 tasks=sum(s.get("Number of Tasks", 0)
                                           for s in ev.get("Stage Infos", [])))
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
    done = [j for j in jobs.values() if j["end"]]
    done.sort(key=lambda j: j["start"])
    job_wall = sum(j["end"] - j["start"] for j in done) / 1000.0
    # union of job intervals (concurrent jobs don't double-count)
    union = 0
    cur_s = cur_e = None
    for j in done:
        if cur_e is None or j["start"] > cur_e:
            if cur_e is not None:
                union += cur_e - cur_s
            cur_s, cur_e = j["start"], j["end"]
        else:
            cur_e = max(cur_e, j["end"])
    if cur_e is not None:
        union += cur_e - cur_s
    wall = (app_end - app_start) / 1000.0 if app_start and app_end else None
    print(f"jobs={len(done)} job_wall_sum={job_wall:.2f}s "
          f"job_wall_union={union/1000.0:.2f}s app_wall={wall}s")
    if wall:
        print(f"driver_gap (wall - job union) = {wall - union/1000.0:.2f}s")
    if show_jobs:
        prev_end = app_start
        for i, j in enumerate(done):
            gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
            print(f"  job {j['jid']:3d} {(j['end']-j['start'])/1000.0:7.3f}s "
                  f"gap_before={gap:6.3f}s stages={j['stages']:2d} "
                  f"tasks={j['tasks']:4d}  {j['desc']}")
            prev_end = j["end"]

if __name__ == "__main__":
    main()
