"""Summarize a Spark event log: jobs, stages, tasks, task time, shuffle bytes.

Wall-clock on this box swings ±40% with host noise; these counters are
deterministic per plan shape, so before/after comparisons of an
optimization use them (guide §1: measure what the job DOES, not just
how long it took). Usage:

    python scripts/evlog_stats.py <eventlog file> [phase-marker ...]

With phase markers (job-description substrings), buckets stats per
marker; otherwise prints one global summary.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    markers = sys.argv[2:]

    buckets: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
    job_desc: dict[int, str] = {}
    stage_to_job: dict[int, int] = {}

    def bucket_for(desc: str) -> str:
        for m in markers:
            if m in desc:
                return m
        return "__other__"

    import glob
    import io
    import os

    if os.path.isdir(path):  # rolling event-log v2 directory
        inner = sorted(glob.glob(os.path.join(path, "events_*")))
        streams = []
        for p in inner:
            if p.endswith(".zstd"):
                import subprocess

                proc = subprocess.Popen(
                    ["zstd", "-dc", p], stdout=subprocess.PIPE
                )
                streams.append(io.TextIOWrapper(proc.stdout))
            else:
                streams.append(open(p))
    else:
        streams = [open(path)]

    def lines():
        for fh in streams:
            yield from fh

    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get("spark.job.description", "") or ""
                job_desc[jid] = desc
                b = bucket_for(desc)
                buckets[b]["jobs"] += 1
                for s in ev.get("Stage IDs", []):
                    stage_to_job[s] = jid
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                jid = stage_to_job.get(si["Stage ID"])
                b = bucket_for(job_desc.get(jid, ""))
                buckets[b]["stages"] += 1
                buckets[b]["tasks"] += si.get("Number of Tasks", 0)
            elif et == "SparkListenerTaskEnd":
                si = ev.get("Stage ID")
                jid = stage_to_job.get(si)
                b = bucket_for(job_desc.get(jid, ""))
                tm = ev.get("Task Metrics") or {}
                buckets[b]["task_ms"] += tm.get("Executor Run Time", 0)
                buckets[b]["gc_ms"] += tm.get("JVM GC Time", 0)
                buckets[b]["cpu_ms"] += (tm.get("Executor CPU Time", 0)) / 1e6
                sw = tm.get("Shuffle Write Metrics") or {}
                buckets[b]["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                buckets[b]["shuffle_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                buckets[b]["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)

    for b in sorted(buckets):
        s = buckets[b]
        print(
            f"{b:24s} jobs={int(s['jobs']):5d} stages={int(s['stages']):5d} "
            f"tasks={int(s['tasks']):6d} task_s={s['task_ms']/1000:9.1f} "
            f"cpu_s={s['cpu_ms']/1000:9.1f} gc_s={s['gc_ms']/1000:7.1f} "
            f"shw_mb={s['shuffle_write_b']/1e6:9.1f} shr_mb={s['shuffle_read_b']/1e6:9.1f}"
        )


if __name__ == "__main__":
    main()
