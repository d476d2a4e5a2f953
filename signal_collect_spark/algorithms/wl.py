"""Weisfeiler-Lehman (1-WL) color refinement — structural vertex
fingerprints.

Each round every vertex hashes (own color, sorted multiset of
neighbour colors) into a new color; after k rounds two vertices share
a color only if their k-hop unfolding trees are identical (Weisfeiler
& Lehman 1968; Shervashidze et al., JMLR'11 WL-kernels).  On web/code
link graphs the color histogram is a cheap structural fingerprint —
the graph-shaped sibling of the document fingerprint operators
(data/textstats.py): near-isomorphic subgraphs (template farms,
vendored code trees) collide, everything else separates.

This is the reference's neighbourhood-set signalling pattern
(examples/ClusteringCoefficient.scala:45 ships neighbour ids; here we
ship colors) run for a fixed round count.  Implementation is a driver
loop of pure DataFrame ops — one join + one sorted-list aggregate per
round (the multiset is order-canonicalized with `sort_array`, then
md5-compressed so per-vertex state stays 32 bytes regardless of
degree).  Hub note: a 10^7-degree vertex's collect_list is that
vertex's neighbour list — same order of magnitude as its adjacency
rows; for hub-heavy graphs pre-aggregate duplicate colors
(count-suffixed) before the list agg; at that point the list length is
bounded by the color-diversity of the neighbourhood, not the degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.superstep import ExecutionInfo, loop_aqe_off


@loop_aqe_off
def wl_colors(
    spark,
    edges: DataFrame,
    *,
    rounds: int = 3,
    undirected: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Returns (DF[id, color], info) after ``rounds`` refinements;
    ``color`` is a 32-hex md5 string.  Round 0 is the uniform color
    "0" (round 1 therefore separates by degree)."""
    import time as _time

    t0 = _time.monotonic()
    info = ExecutionInfo()
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e_raw = edges.select("src", "dst")
    if undirected:
        e_raw = e_raw.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # refinement runs on the simple graph (self-loops dropped), but the
    # vertex set comes from the PRE-filter edges: a vertex whose only
    # incident edges are self-loops still gets a color row (as an
    # isolated vertex), matching the oracle's every-vertex convention.
    e = (
        e_raw.filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(P, "dst")
        .persist()
    )
    verts = (
        e_raw.select(F.col("src").alias("id"))
        .unionAll(e_raw.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(P, "id")
    )
    colors = verts.select("id", F.lit("0").alias("color")).persist()
    colors.count()
    first = colors
    for rnd in range(rounds):
        nb = e.join(
            colors.select(F.col("id").alias("dst"), F.col("color").alias("ncolor")),
            "dst",
        ).select(F.col("src").alias("id"), "ncolor")
        sig = nb.groupBy("id").agg(
            F.concat_ws(",", F.sort_array(F.collect_list("ncolor"))).alias("sig")
        )
        nxt = (
            colors.join(sig, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws("|", F.col("color"), F.coalesce(F.col("sig"), F.lit("")))
                ).alias("color"),
            )
            .repartition(P, "id")
            # intermediate rounds chain lazily (one job for the whole
            # refinement instead of one blocking job per round); the
            # checkpoint still truncates the logical plan immediately
            # and RDD-persists on materialization. The LAST round stays
            # eager: the e.unpersist() below is only safe once the
            # chain has actually materialized.
            .localCheckpoint(eager=rnd == rounds - 1)
        )
        old = colors
        colors = nxt
        if old is not first:
            old.unpersist()
        info.supersteps = rnd + 1
        info.per_step.append({"superstep": rnd + 1, "wall_ms": None})
    first.unpersist()
    e.unpersist()
    info.converged = True
    info.stop_reason = "max_steps"
    info.wall_seconds = _time.monotonic() - t0
    return colors, info


def wl_histogram(colors: DataFrame) -> DataFrame:
    """DF[color, n_vertices] — the structural fingerprint histogram."""
    return colors.groupBy("color").agg(F.count("*").alias("n_vertices"))
