"""Eigenvector centrality through the superstep engine.

Beyond-reference centrality closing the spectral family around
PageRank (pagerank.py), Katz (katz.py), HITS (hits.py) and SALSA
(salsa.py): eigenvector centrality (Bonacich, J. Math. Sociol. 1972)
is the principal left eigenvector of the weighted adjacency —

    x(v)  ∝  SUM_{(u,v) in E} w(u,v) * x(u)

i.e. Katz's recurrence with no additive beta and PageRank's with no
teleport/out-degree split, computed by power iteration from the
uniform start vector.

Implementation detail that buys cross-engine exactness: the iteration
runs UN-normalized for a fixed number of steps and normalizes ONCE at
the end (x_k / ||x_k||_1). For integer edge weights every intermediate
value is an exact integer in doubles (no rounding, no reassociation
noise), so the final division is bit-identical in any engine that
replays the same k gather-sums — the SQL oracle unrolls them verbatim.
A pre-flight bound check refuses runs where (max weighted in-degree)^k
could leave the 2^53 exact-integer window; normalize-per-step is the
standard fallback at larger k and is what a production caller on a
10^9-edge graph would use (steps there are O(10), bounds hold).

Kernel mapping: value = current x, edge_combine = mul (raw weight),
agg = sum, collect REPLACES state with the inbox (power iteration is
a full Jacobi sweep, not a delta update), residual pinned to 1.0 so
every vertex stays in the frontier every step — the engine's gating,
partitioning, salting, byte-diet and checkpoint machinery all apply
unchanged. Vertices with no in-edges fall to 0 (their true
eigenvector weight).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps


def eigen_kernel() -> Kernel:
    def init(vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.lit(1.0).alias("x"), F.lit(1.0).alias("residual")
        )

    def collect(joined: DataFrame) -> DataFrame:
        return joined.select(
            "id",
            F.coalesce(F.col("inbox"), F.lit(0.0)).alias("x"),
            F.lit(1.0).alias("residual"),
        )

    return Kernel(
        name="eigencentrality",
        init=init,
        value=lambda: F.col("x"),
        edge_combine="mul",
        agg="sum",
        collect=collect,
        weight_col="weight",
        state_cols=["x", "residual"],
    )


def eigencentrality(
    spark,
    edges: DataFrame,
    *,
    steps: int = 8,
    num_partitions: int | str | None = "auto",
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """``steps`` power-iteration sweeps; returns (DF[id, eigen], info)
    with eigen = x_steps / ||x_steps||_1 rounded to 9 dp (sum-to-one up
    to rounding). All-zero fixpoints (e.g. a DAG, whose only
    eigenvector weight sits on cycles it lacks) return eigen = 0 rows.

    Exactness guard: with integer weights the un-normalized trajectory
    is exact while ||x||_inf <= 2^53; since ||x_k||_inf grows by at
    most the max weighted in-degree per step, the guard raises when
    steps * log2(max_wdeg) > 52 — lower ``steps`` or pre-scale weights.
    """
    if steps < 1:
        raise ValueError("steps must be >= 1")
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))  # Edge.scala:50 default
    norm = G.normalize_edges(edges)
    wdeg = (
        norm.groupBy("dst").agg(F.sum("weight").alias("wd")).agg(F.max("wd")).first()[0]
    )
    if wdeg is not None and float(wdeg) > 1.0 and steps * math.log2(float(wdeg)) > 52:
        raise ValueError(
            f"eigencentrality: {steps} steps x max weighted in-degree {wdeg} "
            "can exceed the 2^53 exact-integer window — reduce steps or "
            "pre-scale edge weights"
        )
    vertices = G.vertices_from_edges(edges)
    state, info = run_supersteps(
        spark,
        norm,
        vertices,
        eigen_kernel(),
        signal_threshold=0.0,
        converge_tol=0.0,
        max_steps=steps,
        num_partitions=num_partitions,
        **engine_opts,
    )
    total = state.agg(F.sum("x").alias("__l1"))
    out = state.crossJoin(F.broadcast(total)).select(
        "id",
        F.when(F.col("__l1") > 0, F.round(F.col("x") / F.col("__l1"), 9))
        .otherwise(F.lit(0.0))
        .alias("eigen"),
    )
    return out, info
