"""Newman modularity of a vertex partition — the quality functional
for community labelings.

Beyond-reference operator completing the community-detection path: the
engine's Chinese-Whispers label propagation (labelprop.py, the
reference's community example surface) produces a labeling, and
modularity (Newman & Girvan 2004, eq. Q = (1/2m) Σ_ij [A_ij −
k_i·k_j/2m] δ(c_i,c_j)) is the standard score of that labeling —
without it a user can't compare two LP runs or tune round counts.

Computed on the undirected doubled view (each edge in both
directions, the same view label propagation itself uses), the sum
collapses to

    Q = in_w / W  −  Σ_c (K_c / W)²

where W = total doubled edge weight, in_w = doubled weight with both
endpoints in the same community, K_c = summed weighted degree of
community c.

Scale shape: two equi hash-joins of the doubled edge set with the
(id, label) table (partitioned on the join keys, no broadcast of the
|V|-sized label side), then three map-side-combined aggregates — one
scan of edges per join, no windows, no driver loops. Σ_c runs over
the community count (≤|V|), a tiny final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    weight_col: str = "weight",
) -> DataFrame:
    """One-row DF (modularity, n_communities, total_weight) scoring the
    partition ``labels`` (id, label) on the UNDIRECTED view of
    ``edges`` (src, dst, weight; self-loops dropped, each edge counted
    in both directions exactly once).

    Vertices missing from ``labels`` contribute nothing to in-community
    weight (each such vertex acts as its own singleton) but their
    degree still counts toward W — matching the usual convention that
    the partition must cover the graph for Q to be comparable.
    """
    e = edges.select("src", "dst", F.col(weight_col).alias("weight")).filter(
        F.col("src") != F.col("dst")
    )
    u = (
        e.unionAll(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .distinct()
    )
    lab = labels.select("id", "label")
    w = u.agg(F.sum("weight").alias("W"))
    deg = u.groupBy("src").agg(F.sum("weight").alias("k"))
    in_w = (
        u.join(lab.select(F.col("id").alias("src"), F.col("label").alias("la")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("lb")), "dst")
        .filter(F.col("la") == F.col("lb"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("in_w"))
    )
    kc = (
        deg.join(lab.select(F.col("id").alias("src"), "label"), "src")
        .groupBy("label")
        .agg(F.sum("k").alias("K"))
    )
    ncomm = lab.agg(F.count_distinct("label").alias("n_communities"))
    expected = kc.crossJoin(F.broadcast(w)).agg(
        F.sum((F.col("K") / F.col("W")) * (F.col("K") / F.col("W"))).alias("exp_q")
    )
    return (
        in_w.crossJoin(F.broadcast(w))
        .crossJoin(F.broadcast(expected))
        .crossJoin(F.broadcast(ncomm))
        .select(
            F.round(F.col("in_w") / F.col("W") - F.col("exp_q"), 6).alias(
                "modularity"
            ),
            F.col("n_communities").cast("long").alias("n_communities"),
            F.round("W", 6).alias("total_weight"),
        )
    )
