"""Sized-P variant of the 2->8 scaling pair: shuffle partitions scale
with cores (P = 4*cores -> 2 cores @ P=8, 8 cores @ P=32, i.e. ~4 task
waves per core at BOTH levels), which is how a real cluster sizes P
(and what the engine's num_partitions="auto" does at data scale, where
|E|/1M partitions >> cores at every level).

Rationale: the fixed-P evidence (scripts/rerun_pair.py, P=8 at both
levels) gives the 8-core level exactly ONE task wave per stage, so a
single straggler task bounds the whole stage — a granularity artifact
of the tiny sandbox graph, not an engine property. At 100 TB scale the
partition count dwarfs core count at every level, so both levels get
many waves, which this variant reproduces. Reported ALONGSIDE the
fixed-P pair, clearly labeled, per the r4 verdict's suggestion.

Usage: python scripts/rerun_pair_sized.py [lo hi [repeats]]
Prints one JSON line like rerun_pair.py. Does NOT rewrite
BENCH/BASELINE.md — merge by hand.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import WORKER, median, run_worker  # noqa: E402

STEPS, FAN = 6, 96


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    p_of = {c: 4 * c for c in (lo, hi)}
    raw = {c: [] for c in (lo, hi)}
    for rep in range(repeats):
        for c in (lo, hi):
            r = run_worker(WORKER, [str(c), str(STEPS), str(FAN), str(p_of[c])])
            raw[c].append(r)
            print(json.dumps({"rep": rep, "P": p_of[c], **r}), file=sys.stderr, flush=True)
    res = {}
    for c in (lo, hi):
        eps = [r["edges_per_sec"] for r in raw[c]]
        res[c] = {
            "P": p_of[c],
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
                "variant": "sized-P (P=4*cores, ~4 waves/core both levels)",
                "pair": f"{lo}->{hi}",
                "repeats": repeats,
                "levels": {str(c): res[c] for c in (lo, hi)},
                "efficiency_raw": round(eff, 3),
                "tasksec_inflation": round(infl, 3),
                "efficiency_tasksec_normalized": round(eff * infl, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
