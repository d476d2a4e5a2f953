"""k-truss decomposition via distributed support peeling.

Beyond-reference link-graph operator (the reference's densest cohesion
primitive is the triangle/clustering-coefficient vertex,
examples/ClusteringCoefficient.scala:24-47; the k-truss is the standard
edge-level strengthening): the maximal subgraph in which every edge is
supported by >= k-2 triangles *within the subgraph*.  Trusses are the
classic web/social cohesion unit (Cohen, NSA tech report 2008) — more
selective than the k-core, cheaper than clique enumeration.

Algorithm: repeatedly delete every edge whose triangle support in the
current subgraph is < k-2, until none is deleted.  Like the k-core
peel, the fixpoint is unique and order-independent, so batch deletion
per round is exact.  Each round recomputes support with the same
canonical-orientation triangle join as :mod:`triangles` (a<b<c — one
row per triangle, hub out-degree capped by the orientation), explodes
each triangle to its three edges, and counts per edge.

Scale shape: per round, one triangle join over a shrinking edge set +
one count aggregate keyed by (a,b); the edge count strictly decreases
every non-final round so an unchanged count IS convergence (exact, no
fingerprint); lineage is cut per round with localCheckpoint.  Rounds
are bounded by the peel depth (small on power-law graphs).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.kcore import _auto_partitions
from signal_collect_spark.superstep import ExecutionInfo


def _support(e: DataFrame) -> DataFrame:
    """DF[a, b, support] for canonical edges e[a<b]: triangles through
    the edge, 0-support edges absent (the caller left-joins)."""
    e1 = e.select("a", "b")
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    wedges = e1.join(e2, e1["b"] == e2["b2"]).select("a", "b", "c")
    tri = wedges.join(
        e3, (wedges["a"] == e3["a3"]) & (wedges["c"] == e3["c3"])
    ).select("a", "b", "c")
    sides = (
        tri.select(F.col("a"), F.col("b"))
        .unionAll(tri.select(F.col("a"), F.col("c").alias("b")))
        .unionAll(tri.select(F.col("b").alias("a"), F.col("c").alias("b")))
    )
    return sides.groupBy("a", "b").agg(F.count("*").alias("support"))


def k_truss(
    spark,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 200,
    num_partitions: int | str | None = "auto",
) -> tuple[DataFrame, ExecutionInfo]:
    """Edges of the k-truss of the UNDIRECTED simple graph, canonical
    orientation, with their within-truss support.

    Returns (DF[a: long, b: long, support: long], info) — empty when no
    k-truss exists.  k >= 3 (the 2-truss is the whole simple graph).
    ``info.supersteps`` = peel rounds including the final no-change
    round; ``info.per_step`` carries surviving edge counts.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    P = _auto_partitions(spark, edges, num_partitions)
    t0 = _time.monotonic()
    info = ExecutionInfo()

    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(P, "a")
        .persist()
    )
    first = e
    prev_n = e.count()
    rounds = 0
    for rnd in range(max_rounds):
        sup = _support(e)
        new_e = (
            e.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
            .repartition(P, "a")
            .localCheckpoint(eager=False)
        )
        n = new_e.count()
        e = new_e
        rounds = rnd + 1
        info.per_step.append({"superstep": rounds, "edges": n, "wall_ms": None})
        if n == prev_n:
            info.converged = True
            info.stop_reason = "converged"
            break
        prev_n = n
    info.supersteps = rounds

    out = (
        e.join(_support(e), ["a", "b"], "left")
        .select("a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support"))
        .localCheckpoint(eager=True)
    )
    first.unpersist()
    info.wall_seconds = _time.monotonic() - t0
    return out, info
