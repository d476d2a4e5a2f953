"""Triangle counting + local clustering coefficient.

Reference semantics (examples/ClusteringCoefficient.scala:24-47): each
vertex signals its neighbour-id set (:45); collect sums
|own ∩ neighbour| over all incoming sets and divides by deg·(deg−1)
(:31-38) — on an undirected graph that numerator is exactly
2 · triangles(v), and the quotient is the local clustering
coefficient (NaN/undefined for deg ≤ 1).

Spark-first implementation: shipping neighbour SETS per edge (the
reference's approach) is O(Σ deg²) network — instead we use the
canonical-orientation triangle join, the textbook distributed
formulation: orient every undirected edge low→high id, then
  triangles = e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c)      with a < b < c
Each triangle is counted exactly once. The first join's build side is
bounded by degree; hub skew is capped by the orientation itself
(a hub's oriented out-degree counts only higher-id neighbours) — the
standard mitigation at 10^9-edge scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G


def _oriented(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges oriented min(id) → max(id), self-loops dropped."""
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b"))
    return und.distinct()


def triangle_triples(edges: DataFrame) -> DataFrame:
    """DF[a, b, c] with a<b<c, one row per triangle."""
    e = _oriented(edges)
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    wedges = e1.join(e2, e1["b"] == e2["b2"]).select("a", "b", "c")
    return wedges.join(
        e3, (wedges["a"] == e3["a3"]) & (wedges["c"] == e3["c3"])
    ).select("a", "b", "c")


def triangle_count(spark, edges: DataFrame) -> int:
    """Global triangle count (exact)."""
    return triangle_triples(edges).count()


def per_vertex_triangles(edges: DataFrame) -> DataFrame:
    """DF[id, tri_count] — triangles incident to each vertex (exact).

    Vertices in no triangle get tri_count = 0.
    """
    t = triangle_triples(edges)
    incident = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    counts = incident.groupBy("id").agg(F.count("*").alias("tri_count"))
    verts = G.vertices_from_edges(edges)
    return verts.join(counts, "id", "left").select(
        "id", F.coalesce(F.col("tri_count"), F.lit(0)).alias("tri_count")
    )


def local_clustering_coefficient(spark, edges: DataFrame) -> DataFrame:
    """DF[id, tri_count, degree, local_coeff].

    local_coeff = 2·tri / (deg·(deg−1)) on the undirected simple graph —
    identical to the reference's collect quotient
    (ClusteringCoefficient.scala:31-38: Σ|N(v) ∩ N(u)| / deg(deg−1),
    numerator counts each triangle twice). NULL where deg ≤ 1
    (reference yields NaN).
    """
    und = _oriented(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    tri = per_vertex_triangles(edges)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            "tri_count",
            F.coalesce(F.col("degree"), F.lit(0)).alias("degree"),
            F.when(
                F.col("degree") > 1,
                2.0 * F.col("tri_count") / (F.col("degree") * (F.col("degree") - 1)),
            ).alias("local_coeff"),
        )
    )
