"""Focused rerun of ONE scaling pair (default 2 vs 8 cores) reusing the
pinned worker from bench_scaling.py — for re-measuring a single N→4N
pair on a quiet host without paying for the full 5-level sweep.

Usage: python scripts/rerun_pair.py [lo hi [repeats]]
Prints one JSON line: per-level runs, medians, raw and task-second-
normalized pair efficiency. Does NOT rewrite BENCH/BASELINE.md — merge
the numbers by hand so the full-sweep provenance there stays intact.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import WORKER, median, run_worker  # noqa: E402

STEPS, FAN, P = 6, 96, 8


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    raw = {c: [] for c in (lo, hi)}
    for rep in range(repeats):
        for c in (lo, hi):
            r = run_worker(WORKER, [str(c), str(STEPS), str(FAN), str(P)])
            raw[c].append(r)
            print(json.dumps({"rep": rep, **r}), file=sys.stderr, flush=True)
    res = {}
    for c in (lo, hi):
        eps = [r["edges_per_sec"] for r in raw[c]]
        res[c] = {
            "edges_per_sec_runs": sorted(eps),
            "edges_per_sec": median(eps),
            "seconds_runs": [r["seconds"] for r in raw[c]],
            "task_sec_runs": [r["task_sec_total"] for r in raw[c]],
            "task_sec_total": median([r["task_sec_total"] for r in raw[c]]),
            "sum_ranks": sorted({r["sum_rank"] for r in raw[c]}),
        }
    eff = (res[hi]["edges_per_sec"] / res[lo]["edges_per_sec"]) / (hi / lo)
    infl = res[hi]["task_sec_total"] / res[lo]["task_sec_total"]
    print(
        json.dumps(
            {
                "pair": f"{lo}->{hi}",
                "repeats": repeats,
                "levels": res,
                "efficiency_raw": round(eff, 3),
                "tasksec_inflation": round(infl, 3),
                "efficiency_tasksec_normalized": round(eff * infl, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
