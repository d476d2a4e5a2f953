"""Topological levels (longest-path layering) on a DAG.

level(v) = 0 for sources, else 1 + max over in-edges of level(u) — the
layer assignment a topological sort groups by, and the critical-path
depth of v.  This is the max-plus analogue of the engine's SSSP kernel
(reference examples/Sssp.scala:32-79: min-plus collect, state-change
scoring): signal = level(u) + 1 along each out-edge, collect = max-fold
of the inbox, scoreSignal = 1 iff the level grew.  Convergence in
(longest path length) supersteps; a cycle would grow levels forever,
so non-convergence within ``max_steps`` raises instead of silently
returning a partial fixpoint.

``orient_acyclic`` derives a DAG from an arbitrary edge table by
keeping edges src < dst (every id ordering induces an acyclic
orientation), the same canonicalization the triangle operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps


def orient_acyclic(edges: DataFrame) -> DataFrame:
    """Acyclic orientation: keep src < dst (drops self-loops), unit weight."""
    return (
        edges.filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def dag_levels_kernel() -> Kernel:
    def init(vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.lit(0.0).alias("level"), F.lit(1.0).alias("residual")
        )

    def collect(joined: DataFrame) -> DataFrame:
        new_level = F.greatest(F.col("level"), F.col("inbox"))
        return joined.select(
            "id",
            new_level.alias("level"),
            F.when(new_level > F.col("level"), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("residual"),
        )

    return Kernel(
        name="dag_levels",
        init=init,
        value=lambda: F.col("level"),
        edge_combine="add",  # level + weight(=1) = level of v through u
        agg="max",
        collect=collect,
        state_cols=["level", "residual"],
    )


def dag_levels(
    spark,
    edges: DataFrame,
    *,
    max_steps: int = 200,
    mode: str = "sql",
    num_partitions: int | str | None = "auto",
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Returns (DF[id, level:long], info).  ``edges`` must be acyclic
    (use :func:`orient_acyclic` to derive a DAG); raises ValueError if
    the fixpoint does not settle within ``max_steps`` supersteps, which
    on a finite graph can only mean a cycle."""
    vertices = G.vertices_from_edges(edges)
    state, info = run_supersteps(
        spark,
        edges,
        vertices,
        dag_levels_kernel(),
        signal_threshold=0.0,
        converge_tol=0.0,
        max_steps=max_steps,
        mode=mode,
        num_partitions=num_partitions,
        **engine_opts,
    )
    if not info.converged:
        raise ValueError(
            f"dag_levels did not converge in {max_steps} supersteps — "
            "the edge table contains a cycle (or raise max_steps)"
        )
    return state.select("id", F.col("level").cast("long").alias("level")), info
