"""Time-respecting (temporal) earliest-arrival reachability.

On a temporal edge list (src, dst, weight = contact time), a message
starting at the source at time ``t0`` can traverse edge (u, v, t)
only if it has already arrived at u by the contact time (t >=
arrival(u)); it then reaches v at time t.  The earliest-arrival
fixpoint

    arrival(v) = min { t : edge(u, v, t), t >= arrival(u) }

is the temporal-graph analogue of SSSP (Wu et al., VLDB'14 "path
problems in temporal graphs") — the standard primitive for spread /
influence analysis on interaction logs.

Engine mapping: the same min-monoid shape as examples/Sssp.scala:32-79
(collect = min-fold, scoreSignal = state changed) with a USER-DEFINED
edge signal — the reference lets Edge.signal compute any function of
source state + edge payload (DefaultEdge.scala:56), mirrored here by
passing a callable ``edge_combine``:

    signal(u → v) = t            if t >= arrival(u)
                    +inf         otherwise (unusable contact)

Relaxation is monotone non-increasing, so the synchronous loop
converges in (temporal diameter) supersteps; unreached vertices
surface as NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps

INF = float("inf")


def earliest_arrival_kernel(source_id: int, t0: float) -> Kernel:
    def init(vertices: DataFrame) -> DataFrame:
        arr = F.when(F.col("id") == F.lit(source_id), F.lit(float(t0))).otherwise(
            F.lit(INF)
        )
        return vertices.select(
            "id",
            arr.alias("arrival"),
            F.when(F.col("id") == F.lit(source_id), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("residual"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        new_arr = F.least(F.col("arrival"), F.col("inbox"))
        return joined.select(
            "id",
            new_arr.alias("arrival"),
            F.when(new_arr < F.col("arrival"), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("residual"),
        )

    return Kernel(
        name="earliest_arrival",
        init=init,
        value=lambda: F.col("arrival"),
        # contact usable iff its time is at or after arrival at the src
        edge_combine=lambda v, w: F.when(w >= v, w).otherwise(F.lit(INF)),
        agg="min",
        collect=collect,
        state_cols=["arrival", "residual"],
    )


def earliest_arrival(
    spark,
    temporal_edges: DataFrame,
    source_id: int,
    *,
    t0: float = 0.0,
    max_steps: int = 200,
    num_partitions: int | str | None = "auto",
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """``temporal_edges``: (src, dst, weight = contact time).  Returns
    (DF[id, arrival] with NULL for temporally unreachable, info)."""
    vertices = G.vertices_from_edges(temporal_edges)
    state, info = run_supersteps(
        spark,
        temporal_edges,
        vertices,
        earliest_arrival_kernel(source_id, t0),
        signal_threshold=0.0,
        converge_tol=0.0,
        max_steps=max_steps,
        mode="sql",
        num_partitions=num_partitions,
        **engine_opts,
    )
    return (
        state.select(
            "id",
            F.when(F.col("arrival") == F.lit(INF), F.lit(None))
            .otherwise(F.col("arrival"))
            .alias("arrival"),
        ),
        info,
    )
