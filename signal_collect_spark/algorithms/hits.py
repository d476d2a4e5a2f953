"""HITS (hubs & authorities) — Kleinberg's algorithm as superstep joins.

Beyond-reference link-graph operator: the reference ships PageRank as
its ranking example (examples/PageRank.scala); HITS is the other
classic link-analysis fixpoint, and it maps onto the same dataflow
shape the engine uses — per-superstep edge join + keyed sum — with two
half-steps (authority update along in-edges, hub update along
out-edges) instead of one.

    a_k(v) = Σ_{(u,v) ∈ E} h_{k-1}(u)   then L2-normalize a_k
    h_k(u) = Σ_{(u,v) ∈ E} a_k(v)       then L2-normalize h_k

Scale shape: the edge set is partitioned + persisted once; each
half-step is one hash-join with the current score vector and one
map-side-combined sum by the opposite endpoint. Normalization is a
1-row aggregate crossJoined back broadcast-style, so the whole
iteration stays LAZY — no driver action per step; lineage is cut with
a localCheckpoint per iteration (the star-CC/sudoku lesson: any
iterative join chain must truncate) and the only actions are the
final materialization. Fixed ``steps`` iterations, matching the
power-iteration practice (convergence is geometric in the spectral
gap of AᵀA).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, loop_aqe_off


@loop_aqe_off
def hits(
    spark,
    edges: DataFrame,
    *,
    steps: int = 10,
    num_partitions: int | str | None = "auto",
) -> tuple[DataFrame, ExecutionInfo]:
    """Hub and authority scores over the DIRECTED graph of ``edges``.

    Returns (DF[id, hub: double, authority: double], info) for every
    vertex appearing as a source or target. Scores are L2-normalized
    each half-step (||a||₂ = ||h||₂ = 1 at return, the classic
    formulation); vertices with no in-edges have authority 0, no
    out-edges hub 0.
    """
    if num_partitions == "auto":
        P = max(
            spark.sparkContext.defaultParallelism,
            min(200_000, -(-edges.count() // 1_000_000)),
        )
    else:
        P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(P, "src")
        .persist()
    )
    vertices = G.vertices_from_edges(e).repartition(P, "id").persist()

    state = vertices.select(
        "id", F.lit(1.0).alias("hub"), F.lit(0.0).alias("authority")
    )

    def _l2_normalize(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__norm")
        )
        return (
            df.crossJoin(F.broadcast(norm))
            .withColumn(
                col,
                F.when(F.col("__norm") > 0.0, F.col(col) / F.col("__norm")).otherwise(
                    F.lit(0.0)
                ),
            )
            .drop("__norm")
        )

    for step in range(steps):
        # authority half-step: sum hub scores over in-edges
        auth_in = (
            e.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
        )
        state = (
            state.join(auth_in.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id", "hub", F.coalesce("a_raw", F.lit(0.0)).alias("authority")
            )
        )
        state = _l2_normalize(state, "authority")
        # hub half-step: sum authority scores over out-edges
        hub_out = (
            e.join(state.select(F.col("id").alias("dst"), "authority"), "dst")
            .groupBy("src")
            .agg(F.sum("authority").alias("h_raw"))
        )
        state = (
            state.join(hub_out.withColumnRenamed("src", "id"), "id", "left")
            .select(
                "id", F.coalesce("h_raw", F.lit(0.0)).alias("hub"), "authority"
            )
        )
        state = _l2_normalize(state, "hub")
        # truncate lineage every iteration — 4 joins/step otherwise
        # compound geometrically in the plan
        state = state.repartition(P, "id").localCheckpoint(eager=False)
        info.per_step.append({"superstep": step + 1, "wall_ms": None})

    out = state.localCheckpoint(eager=True)
    e.unpersist()
    vertices.unpersist()
    info.supersteps = steps
    info.converged = True
    info.stop_reason = "steps"
    info.wall_seconds = _time.monotonic() - t0
    return out, info
