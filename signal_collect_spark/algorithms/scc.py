"""Strongly connected components — forward-backward coloring rounds.

The reference's component surface is undirected (min-label CC,
examples/Sssp.scala:64-69 min-fold; ChineseWhispersClustering.scala);
on a DIRECTED web/link graph the strongly connected decomposition is
the standard next analytic (Broder et al.'s bow-tie: one giant SCC,
IN/OUT tendrils). This implements the classic distributed
coloring/FW-BW scheme (Orzan's coloring; FW-BW-Trim of McLendon et
al., both public algorithms) on DataFrame joins:

per round, over the still-unassigned subgraph:
  1. TRIM — vertices with no in-edge or no out-edge are singleton
     SCCs; assign and drop them (one anti-join pass each).
  2. COLOR — forward min-label fixpoint (the engine's directed CC):
     color(v) = min{id(u) : u reaches v} over active vertices.
  3. BACKWARD MARK — frontier BFS from each color's root r (the
     vertex with color == own id) along REVERSED edges restricted to
     same-color endpoints: every vertex that reaches r through its
     own color class is in SCC(r). Every color class resolves its
     root's SCC in the same round, so each round eliminates one SCC
     per color class, not one per graph.

Rounds are O(#SCC-levels) on bow-tie-shaped graphs (single digits in
practice); a deep chain of singleton SCCs degrades toward O(n) rounds,
which TRIM collapses for the common chain shapes. ``max_rounds``
raises loudly instead of returning partial labels.

Scale shape: every step is a key-partitioned join or aggregate on
(src|dst|id) — no driver-side graph state, no collect. The color
restriction keeps the backward frontier inside one SCC candidate
class, so its joins shrink monotonically. Each inner loop
localCheckpoints per step (iterative union/join chains otherwise blow
up Catalyst plan rendering — measured elsewhere in this repo).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo


def strongly_connected_components(
    spark,
    edges: DataFrame,
    *,
    max_rounds: int = 50,
    max_steps: int = 200,
    num_partitions: int | str | None = "auto",
) -> tuple[DataFrame, ExecutionInfo]:
    """Returns (DF[id, scc], info): scc = min vertex id of the strongly
    connected component — exact, deterministic labels (the directed
    analogue of ``connected_components``' contract).

    ``max_rounds`` bounds outer FW-BW rounds, ``max_steps`` bounds each
    inner fixpoint; either exhausting raises RuntimeError (partial
    labels are never returned).
    """
    from signal_collect_spark.algorithms.components import connected_components

    t0 = _time.monotonic()
    info = ExecutionInfo()
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = G.vertices_from_edges(e).localCheckpoint(eager=True)
    assigned: list[DataFrame] = []

    for rnd in range(1, max_rounds + 1):
        if verts.isEmpty():
            info.supersteps = rnd - 1
            info.converged = True
            break

        # --- 1. trim: no in-edge or no out-edge => singleton SCC ----------
        srcs = e.select(F.col("src").alias("id")).distinct()
        dsts = e.select(F.col("dst").alias("id")).distinct()
        trimmed = (
            verts.join(srcs, "id", "left_anti")
            .unionByName(verts.join(dsts, "id", "left_anti"))
            .distinct()
            .select("id", F.col("id").alias("scc"))
            .localCheckpoint(eager=True)
        )
        n_trim = trimmed.count()
        if n_trim:
            assigned.append(trimmed)
            verts = verts.join(trimmed, "id", "left_anti").localCheckpoint(eager=True)
            e = (
                e.join(trimmed.select(F.col("id").alias("src")), "src", "left_anti")
                .join(trimmed.select(F.col("id").alias("dst")), "dst", "left_anti")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            if verts.isEmpty():
                info.per_step.append({"round": rnd, "trimmed": n_trim, "marked": 0})
                info.supersteps = rnd
                info.converged = True
                break

        # --- 2. color: forward min-label fixpoint on the active subgraph --
        colors_df, cinfo = connected_components(
            spark,
            e,
            directed=True,
            max_steps=max_steps,
            num_partitions=num_partitions,
        )
        cinfo.release()
        if not cinfo.converged:
            raise RuntimeError(
                f"scc: coloring fixpoint did not converge within max_steps="
                f"{max_steps} (round {rnd})"
            )
        colors = colors_df.select("id", F.col("component").alias("color"))

        # --- 3. backward mark: BFS from each color root along reversed
        # same-color edges ------------------------------------------------
        ecol = (
            e.join(colors.select(F.col("id").alias("src"), F.col("color").alias("c_src")), "src")
            .join(colors.select(F.col("id").alias("dst"), F.col("color").alias("c_dst")), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            # reversed: marks flow dst -> src
            .select(F.col("dst").alias("from"), F.col("src").alias("to"))
            .localCheckpoint(eager=True)
        )
        marked = colors.filter(F.col("id") == F.col("color")).select("id", "color")
        marked = marked.localCheckpoint(eager=True)
        frontier = marked
        for _ in range(max_steps):
            nxt = (
                frontier.join(ecol, frontier["id"] == ecol["from"])
                .select(F.col("to").alias("id"))
                .distinct()
                .join(marked, "id", "left_anti")
                .join(colors, "id")
                .select("id", "color")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            marked = marked.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        else:
            raise RuntimeError(
                f"scc: backward mark did not converge within max_steps="
                f"{max_steps} (round {rnd})"
            )
        ecol.unpersist()

        n_marked = marked.count()
        info.per_step.append({"round": rnd, "trimmed": n_trim, "marked": n_marked})
        assigned.append(
            marked.select("id", F.col("color").alias("scc")).localCheckpoint(eager=True)
        )
        verts = verts.join(marked.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        e = (
            e.join(marked.select(F.col("id").alias("src")), "src", "left_anti")
            .join(marked.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"scc: not decomposed within max_rounds={max_rounds}")

    if not assigned:
        empty = spark.createDataFrame([], "id long, scc long")
        info.converged = True
        info.wall_seconds = _time.monotonic() - t0
        return empty, info
    out = assigned[0]
    for a in assigned[1:]:
        out = out.unionByName(a)
    out = out.localCheckpoint(eager=True)
    info.wall_seconds = _time.monotonic() - t0
    return out, info
