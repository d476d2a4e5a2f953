"""One-off experiment harness for the N->4N scaling gate.

Usage: python scripts/scaling_experiment.py <cpus> <steps> <fan> <P> <vmod>
Prints one JSON line. Kept separate from bench_scaling.py while iterating.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from signal_collect_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

cpus = int(sys.argv[1])
os.sched_setaffinity(0, set(range(cpus)))  # pin BEFORE the JVM forks
steps = int(sys.argv[2])
fan = int(sys.argv[3])
P = int(sys.argv[4])
vmod = int(sys.argv[5]) if len(sys.argv) > 5 else 2_000_000
MODE = sys.argv[6] if len(sys.argv) > 6 else "sql"

spark = get_spark(
    app_name=f"scale_{cpus}_{P}",
    master=f"local[{cpus}]",
    shuffle_partitions=P,
    extra_conf={
        "spark.driver.memory": "48g",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.ui.enabled": "true",
    },
)
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
edges = (
    li.crossJoin(spark.range(fan).withColumnRenamed("id", "r"))
    .select(
        ((F.col("l_orderkey") * 37 + F.col("r")) % vmod).alias("src"),
        ((F.col("l_partkey") * 61 + F.col("r") * 17) % vmod).alias("dst"),
    )
    .filter("src != dst")
    .distinct()
    .withColumn("weight", F.lit(1.0))
).persist()
n_edges = edges.count()

from signal_collect_spark.algorithms.pagerank import pagerank  # noqa: E402

_, winfo = pagerank(spark, edges, signal_threshold=0.0, converge_tol=0.0, mode=MODE,
                    max_steps=4, check_every=4, num_partitions=P)
winfo.release()

t0 = time.monotonic()
state, info = pagerank(spark, edges, signal_threshold=0.0, converge_tol=0.0, mode=MODE,
                       max_steps=steps, check_every=4, truncate_every=4,
                       num_partitions=P)
dt = time.monotonic() - t0
chk = state.agg(F.sum("rank")).first()[0]

# pull total task time from the UI REST API (within-run parallel efficiency)
import urllib.request, json as _json
base = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = _json.loads(urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete").read())
total_task_ms = sum(st.get("executorRunTime", 0) for st in stages)
total_cpu_ms = sum(st.get("executorCpuTime", 0) for st in stages) / 1e6
gc_ms = sum(st.get("jvmGcTime", 0) for st in stages)
print(json.dumps({
    "cpus": cpus, "P": P, "vmod": vmod, "mode": MODE, "edges": n_edges,
    "supersteps": info.supersteps, "seconds": round(dt, 2),
    "edges_per_sec": round(n_edges * info.supersteps / dt, 1),
    "sum_rank": round(chk, 6),
    "task_sec_total": round(total_task_ms / 1000.0, 1),
    "cpu_sec_total": round(total_cpu_ms / 1000.0, 1),
    "gc_sec_total": round(gc_ms / 1000.0, 1),
}))
