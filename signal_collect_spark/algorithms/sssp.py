"""Single-source shortest paths (min-plus propagation).

Reference semantics (examples/Sssp.scala:32-79): state Option[Int],
source = Some(0); collect = min(state, signal) (:64-69); signal =
source.state + edge weight via OptionalSignalEdge — None (unreached)
is never sent (:40-46); scoreSignal = 1 iff state changed (:71-77).
EfficientSssp (examples/EfficientSssp.scala:93-136) is the hop-count
(weight=1) collect-on-delivery variant.

Spark: unreached = +inf (never emitted because only improved vertices
are in the frontier and inf+w never improves a neighbour... it could
pollute; so the frontier gate ALSO filters state < inf — the
OptionalSignalEdge None-suppression). Min-fold over inbox; residual =
1 iff improved. Unreachable vertices surface as NULL distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps

INF = float("inf")


def sssp_kernel(source_id: int) -> Kernel:
    def init(vertices: DataFrame) -> DataFrame:
        dist = F.when(F.col("id") == F.lit(source_id), F.lit(0.0)).otherwise(F.lit(INF))
        return vertices.select(
            "id",
            dist.alias("dist"),
            # only the source signals initially; OptionalSignalEdge would
            # suppress the None state of everyone else
            F.when(F.col("id") == F.lit(source_id), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("residual"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        new_dist = F.least(F.col("dist"), F.col("inbox"))
        return joined.select(
            "id",
            new_dist.alias("dist"),
            F.when(new_dist < F.col("dist"), F.lit(1.0)).otherwise(F.lit(0.0)).alias(
                "residual"
            ),
        )

    return Kernel(
        name="sssp",
        init=init,
        value=lambda: F.col("dist"),
        edge_combine="add",
        agg="min",
        collect=collect,
        state_cols=["dist", "residual"],
    )


def sssp(
    spark,
    edges: DataFrame,
    source_id: int,
    *,
    max_steps: int = 200,
    mode: str = "sql",
    num_partitions: int | str | None = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Returns (DF[id, dist] with NULL for unreachable, info)."""
    vertices = G.vertices_from_edges(edges)
    state, info = run_supersteps(
        spark,
        edges,
        vertices,
        sssp_kernel(source_id),
        signal_threshold=0.0,
        converge_tol=0.0,
        max_steps=max_steps,
        mode=mode,
        num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        **engine_opts,
    )
    return (
        state.select(
            "id",
            F.when(F.col("dist") == F.lit(INF), F.lit(None)).otherwise(F.col("dist")).alias("dist"),
        ),
        info,
    )
