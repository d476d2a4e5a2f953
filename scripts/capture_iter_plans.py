"""Capture per-iteration physical plans for the iterative operators.

Usage: python scripts/capture_iter_plans.py <repo_root> <out_dir> [name ...]

For loop-shaped operators the final DataFrame's explain is just the
checkpointed leaf; what matters for performance claims is the plan of
ONE iteration (exchange count, join strategy, partial aggregation).
This builds exactly one iteration of each operator on the sf0.001
lineitem link graph and explains it lazily.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    repo, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    sys.path.insert(0, repo)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from signal_collect_spark.session import get_spark

    spark = get_spark(app_name="capture_iter", master="local[8]", shuffle_partitions=8)
    os.makedirs(out_dir, exist_ok=True)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.select(
            (F.col("l_orderkey") % 100_000).alias("src"),
            (F.col("l_partkey") % 100_000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    ).persist()
    edges.count()

    def dump(name: str, df: DataFrame) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"OK   {name}", file=sys.stderr)

    def want(name: str) -> bool:
        return not only or name in only

    if want("pagerank_superstep"):
        # one superstep: run the engine for exactly 1 step with no
        # truncation; the state it returns is 1 collect past init
        from signal_collect_spark.algorithms import pagerank

        state, info = pagerank(
            spark, edges, signal_threshold=1e-9, converge_tol=0.0,
            max_steps=1, check_every=10, truncate_every=10**9,
        )
        dump("pagerank_superstep", state)
        info.release()

    if want("salsa_step"):
        from signal_collect_spark.algorithms.salsa import salsa as _salsa

        orig = DataFrame.localCheckpoint
        DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore[assignment]
        try:
            out, _ = _salsa(spark, edges, steps=1)
            dump("salsa_step", out)
        finally:
            DataFrame.localCheckpoint = orig

    if want("ppr_round"):
        from signal_collect_spark.algorithms.ppr import ppr_push as _ppr_push

        orig = DataFrame.localCheckpoint
        DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore[assignment]
        try:
            seeds = (
                edges.select(F.col("src").alias("id")).distinct()
                .filter(F.col("id") % 1000 == 0)
            )
            out, _ = _ppr_push(
                spark, edges, seeds, eps=1e-5, max_rounds=1,
                run_to_convergence=False,
            )
            dump("ppr_round", out)
        finally:
            DataFrame.localCheckpoint = orig


if __name__ == "__main__":
    main()
