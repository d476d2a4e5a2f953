"""spark-submit entry point — the cluster deployment path.

The north rule requires the engine to run via
``spark-submit --py-files`` on a multi-executor cluster. This script is
that job: it takes an algorithm name + edge-table location (parquet
directory; an Iceberg table reference works identically through
``spark.read.table``) and writes the result state + lineage.

Cluster usage:
    python scripts/build_pyfiles.py                      # -> dist/signal_collect_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/signal_collect_spark.zip \
        --conf spark.sql.shuffle.partitions=2048 \
        scripts/submit_job.py pagerank \
        --edges s3://bucket/edges --output s3://bucket/ranks \
        --checkpoint-dir s3://bucket/ck --tol 1e-6

Local smoke (what the sandbox tests do):
    spark-submit --master 'local[8]' --py-files dist/signal_collect_spark.zip \
        scripts/submit_job.py pagerank --edges /tmp/edges --output /tmp/ranks
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("algorithm", choices=["pagerank", "cc", "labelprop", "sssp", "triangles"])
    ap.add_argument("--edges", required=True, help="parquet dir / table of (src,dst,weight)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--signal-threshold", type=float, default=0.0)
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--source-id", type=int, default=0, help="sssp source")
    ap.add_argument("--lp-rounds", type=int, default=10)
    ap.add_argument("--mode", default="sql", choices=["sql", "csr"])
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # on a cluster spark-submit supplies master/memory; getOrCreate attaches
    spark = SparkSession.builder.appName(f"sc_spark_{args.algorithm}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from signal_collect_spark.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        sssp,
    )
    from signal_collect_spark.algorithms.triangles import local_clustering_coefficient
    from signal_collect_spark.sources import write_state

    edges = spark.read.parquet(args.edges)
    common = dict(
        max_steps=args.max_steps,
        mode=args.mode,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
        check_every=5,
    )
    if args.algorithm == "pagerank":
        state, info = pagerank(
            spark, edges, signal_threshold=args.signal_threshold,
            converge_tol=args.tol, **common,
        )
    elif args.algorithm == "cc":
        state, info = connected_components(spark, edges, **common)
    elif args.algorithm == "sssp":
        state, info = sssp(spark, edges, args.source_id, **common)
    elif args.algorithm == "labelprop":
        common.pop("mode"), common.pop("checkpoint_dir"), common.pop(
            "checkpoint_every"
        ), common.pop("resume"), common.pop("check_every"), common.pop("max_steps")
        state, info = label_propagation(spark, edges, max_steps=args.lp_rounds,
                                        run_to_convergence=False)
    else:  # triangles
        state = local_clustering_coefficient(spark, edges)
        info = None

    write_state(state, args.output)
    summary = {
        "algorithm": args.algorithm,
        "output": args.output,
        "rows": spark.read.parquet(args.output).count(),
    }
    if info is not None:
        summary.update(
            supersteps=info.supersteps,
            converged=info.converged,
            wall_seconds=round(info.wall_seconds, 2),
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
