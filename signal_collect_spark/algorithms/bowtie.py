"""Bow-tie decomposition of a directed link graph (Broder et al.,
"Graph structure in the Web", WWW'00 — public paper).

Beyond-reference structural analytics: classify every vertex of the
web/code link graph relative to its giant strongly connected component:

  CORE  — member of the largest SCC (ties broken by smallest label)
  IN    — reaches the CORE but is not in it
  OUT   — reachable from the CORE but not in it
  OTHER — everything else (tendrils, tubes, disconnected islands)

IN and OUT are disjoint by construction: a vertex that both reaches
and is reached from the CORE is mutually connected to it and therefore
IS core. Composition of two implemented primitives — the FW-BW SCC
(algorithms/scc.py) and frontier-join BFS (one edges⋈frontier hash
join + one left_anti visited filter per level, the crawler.py shape) —
so every stage is expression-only and partitions on the vertex id.
The two BFS sweeps run over the raw edge table (forward) and its
column-swap (backward); rounds are bounded by graph diameter.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.superstep import ExecutionInfo


def _reach_set(
    edges: DataFrame, seeds: DataFrame, P: int, info: ExecutionInfo, tag: str
) -> DataFrame:
    """All vertices reachable from ``seeds`` (inclusive) along edges.
    Level-synchronous BFS; each level is one hash join + one left_anti."""
    visited = seeds.select("id").distinct().repartition(P, "id").localCheckpoint(
        eager=True
    )
    frontier = visited
    level = 0
    while True:
        nxt = (
            edges.join(frontier, edges["src"] == frontier["id"], "inner")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return visited
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        level += 1
        info.per_step.append({"bfs": tag, "level": level})


def bowtie(
    spark,
    edges: DataFrame,
    *,
    num_partitions: int | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """DataFrame[id, part] with part ∈ {CORE, IN, OUT, OTHER} for every
    vertex of the directed graph, relative to the largest SCC."""
    from signal_collect_spark.algorithms.scc import strongly_connected_components
    from signal_collect_spark.graph import vertices_from_edges

    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(P, "src")
        .persist()
    )
    scc_df, scc_info = strongly_connected_components(spark, e, num_partitions=P)
    info = ExecutionInfo()
    info.per_step.append({"scc_rounds": scc_info.supersteps})

    # largest SCC; ties broken by the smallest label so the choice is
    # deterministic (label = min member id, scc.py)
    core_row = (
        scc_df.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .first()
    )
    core = (
        scc_df.filter(F.col("scc") == core_row["scc"])
        .select("id")
        .localCheckpoint(eager=True)
    )

    fwd = _reach_set(e, core, P, info, "fwd")  # CORE ∪ OUT
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd = _reach_set(rev, core, P, info, "bwd")  # CORE ∪ IN

    verts = vertices_from_edges(e)
    out = (
        verts.join(core.withColumn("__c", F.lit(1)), "id", "left")
        .join(fwd.withColumn("__f", F.lit(1)), "id", "left")
        .join(bwd.withColumn("__b", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("__c").isNotNull(), F.lit("CORE"))
            .when(F.col("__b").isNotNull(), F.lit("IN"))
            .when(F.col("__f").isNotNull(), F.lit("OUT"))
            .otherwise(F.lit("OTHER"))
            .alias("part"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    scc_info.release()
    info.supersteps = len(info.per_step)
    info.wall_seconds = _time.monotonic() - t0
    return out, info
