"""Butterfly counting on bipartite graphs.

The bipartite analogue of triangle counting: a butterfly is a 2×2
biclique (two groups sharing two items — two orders containing the
same two parts, two hosts linking the same two pages).  Butterfly
density is the standard cohesion/spam signal for bipartite web data,
where triangles do not exist by construction.  Extends the projection
operator (:func:`signal_collect_spark.graph.project_bipartite`), the
same way the reference's triangle vertex extends its edge-set signal
(examples/ClusteringCoefficient.scala:24-47).

Counting identity (Wang et al., VLDB'19 "vertex-priority butterfly
counting"): with co(i₁,i₂) = number of groups containing both items,
  wedges      = Σ co              (one per (group, item-pair) incidence)
  butterflies = Σ C(co, 2)        (choose 2 of the co shared groups)
so the whole count rides on the co-occurrence weights the projection
already computes — one quadratic-per-group pair expansion (capped by
``max_group``, the hot-hub guard) and two aggregates.  The cap is the
documented trade: groups above it are skipped and reported in
``n_groups_skipped``, never silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.graph import project_bipartite


def butterfly_count(
    edges: DataFrame,
    *,
    group_col: str = "src",
    item_col: str = "dst",
    max_group: int = 1000,
) -> DataFrame:
    """One-row DF[n_pairs, n_wedges, n_butterflies, n_groups_skipped]
    over the bipartite (group, item) table: distinct co-occurring item
    pairs, wedge incidences, and 2×2 bicliques.  Groups with more than
    ``max_group`` items are excluded from all three counts (and
    counted in n_groups_skipped)."""
    co = project_bipartite(
        edges, group_col=group_col, item_col=item_col,
        max_group=max_group, min_weight=1,
    )
    counts = co.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("n_wedges"),
        # per-row w(w-1)/2 in pure long arithmetic: w(w-1) is even and
        # nonnegative, so shiftright(·, 1) is an exact halving; summing
        # longs keeps integer exactness past 2^53, where a double sum
        # would silently round.
        F.coalesce(
            F.sum(
                F.shiftright(
                    F.col("weight").cast("long")
                    * (F.col("weight").cast("long") - F.lit(1)),
                    1,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_butterflies"),
    )
    skipped = (
        edges.select(
            F.col(group_col).cast("long").alias("g"),
            F.col(item_col).cast("long").alias("i"),
        )
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > max_group)
        .agg(F.count("*").alias("n_groups_skipped"))
    )
    return counts.crossJoin(skipped)
