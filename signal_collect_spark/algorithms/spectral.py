"""Spectral bisection: the sign pattern of the Fiedler direction,
computed by deflated power iteration on the lazy normalized adjacency
— the one graph-partitioning family (spectral methods) the engine's
combinatorial operators (CC, LP, modularity, coarsening) don't cover.

Operator: M = (I + D^{-1/2} A D^{-1/2}) / 2 on the symmetrized simple
graph.  M's spectrum lies in [0, 1]; its principal eigenvector is
v1 ∝ D^{1/2}·1 (eigenvalue 1), and its second eigenvector is the
Fiedler direction of the normalized Laplacian.  Each iteration:

    y = M x            — one edge join + per-vertex sum (the same
                         gather/scatter shape as a PageRank superstep:
                         edges cached once with sqrt-degree at the
                         source, map-side combined aggregation)
    x = y − (v1ᵀy) v1  — deflation; the scalar v1ᵀy is a one-row
                         aggregate crossJoined back as a broadcast, so
                         a step is ONE Spark job shape, no collect.

No per-step normalization is needed (‖M‖ ≤ 1 keeps x bounded); the
result is scaled once at the end by max|x| and rounded to 6 dp.  The
start vector is a deterministic Knuth-hash of the vertex id, so the
output (including the sign split) is reproducible across engines.

At 100 TB scale this is K PageRank-shaped supersteps over a cached
int-keyed edge table — the identical plan the superstep engine runs —
plus one broadcast scalar per step; lineage is truncated every
``trunc_every`` steps exactly as the engine does.

Reference anchor: the vertex-centric iteration surface is the same
signal/collect shape as PageRankVertex/PageRankEdge
(reference/src/main/scala/com/signalcollect/examples/PageRank.scala:35-80);
spectral bisection itself is beyond-reference capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KNUTH = 2654435761
TWO32 = 4294967296


def spectral_bisection(
    spark: SparkSession,
    edges: DataFrame,
    steps: int = 24,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, fiedler, side): 6-dp Fiedler direction (scaled to max|x|=1)
    and its sign split, after ``steps`` deflated power iterations."""
    p = num_partitions or spark.sparkContext.defaultParallelism

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sedges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )

    deg = sedges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    s_tot = deg.agg(F.sum("d").cast("double").alias("s"))
    base = (
        deg.crossJoin(F.broadcast(s_tot))
        .select(
            "id",
            "d",
            (F.sqrt(F.col("d").cast("double")) / F.sqrt(F.col("s"))).alias("v1"),
            (
                ((F.col("id") * F.lit(KNUTH)) % F.lit(TWO32)).cast("double")
                / F.lit(float(TWO32))
                - F.lit(0.5)
            ).alias("x0"),
        )
        .repartition(p, "id")
        .persist()
    )
    # edge cache: sqrt-degree rides at the source so the per-step gather
    # is a single join against the frontier (PageRank plan shape)
    ew = (
        sedges.join(
            base.select(
                F.col("id").alias("src"),
                F.sqrt(F.col("d").cast("double")).alias("sd_src"),
            ),
            "src",
        )
        .repartition(p, "src")
        .persist()
    )
    ew.count()

    x = base.select("id", F.col("x0").alias("x"))
    for k in range(1, steps + 1):
        gather = (
            ew.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("x") / F.col("sd_src")).alias("gather"))
        )
        y = (
            base.join(x, "id")
            .join(gather, "id", "left")
            .select(
                "id",
                "v1",
                (
                    F.lit(0.5)
                    * (
                        F.col("x")
                        + F.coalesce(F.col("gather"), F.lit(0.0))
                        / F.sqrt(F.col("d").cast("double"))
                    )
                ).alias("y"),
            )
        )
        proj = y.agg(F.sum(F.col("v1") * F.col("y")).alias("proj"))
        x = y.crossJoin(F.broadcast(proj)).select(
            "id", (F.col("y") - F.col("proj") * F.col("v1")).alias("x")
        )
        # truncate lineage EVERY step: x_k's logical plan references
        # x_{k-1} four times (gather + state, each under both proj and
        # the update), so an untruncated tree grows 4^k — the checkpoint
        # materializes x once per step, which the barrier action on a
        # real run does anyway.
        x = x.localCheckpoint()

    mx = x.agg(F.max(F.abs(F.col("x"))).alias("m"))
    out = (
        x.crossJoin(F.broadcast(mx))
        .select("id", F.round(F.col("x") / F.col("m"), 6).alias("fiedler"))
        .select(
            "id",
            "fiedler",
            F.when(F.col("fiedler") > 0, F.lit(1)).otherwise(F.lit(0)).alias("side"),
        )
    )
    base.unpersist()
    # x is eagerly checkpointed every step, so nothing in out's lineage
    # still references ew — keeping it pinned was a pure executor-memory
    # leak across multi-query sessions (r5 ADVICE)
    ew.unpersist()
    return out
