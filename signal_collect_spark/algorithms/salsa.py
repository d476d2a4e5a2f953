"""SALSA (Stochastic Approach for Link-Structure Analysis).

Beyond-reference link-graph operator (Lempel & Moran, WWW 2000),
completing the classic ranking trio next to PageRank
(examples/PageRank.scala in the reference) and HITS (hits.py): SALSA
replaces HITS's mutual-reinforcement sums with two coupled random
walks on the bipartite hub/authority view of the directed graph, so
scores are degree-normalized and immune to the tightly-knit-community
effect that skews HITS.

One full step of the authority chain, split into the two half-steps
the engine's dataflow shape (edge join + keyed sum) expresses
directly:

    h_k(u) = SUM_{(u,v) in E} a_{k-1}(v) / indeg(v)
    a_k(w) = SUM_{(u,w) in E} h_k(u)     / outdeg(u)

Both half-steps are exactly stochastic (column-normalized), so L1
mass 1 is preserved without a normalization pass; ``a_0`` is uniform
over vertices with at least one in-edge. The fixpoint of the authority
chain on a connected component is proportional to in-degree — the
iterate at finite ``steps`` is the interesting (and oracle-checkable)
object, mirroring the fixed-step HITS practice.

Scale shape: out/in degrees are computed ONCE and attached to the
persisted edge set as ``1/outdeg(src)`` and ``1/indeg(dst)`` factors,
so each half-step is one hash join with the current score vector plus
one map-side-combined sum — identical plan shape (and cost) to a
PageRank superstep. Lineage is cut with a per-iteration
``localCheckpoint`` (the iterative-join-chain lesson from star CC /
HITS — and the plan truncation also keeps Spark's per-action UI
explain rendering linear); the ContextCleaner reclaims each
iteration's checkpoint blocks once the loop drops its reference. The
only driver action is the final materialization.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, loop_aqe_off


@loop_aqe_off
def salsa(
    spark,
    edges: DataFrame,
    *,
    steps: int = 8,
    num_partitions: int | str | None = "auto",
) -> tuple[DataFrame, ExecutionInfo]:
    """Hub and authority SALSA scores over the DIRECTED ``edges`` graph.

    Returns (DF[id, hub: double, authority: double], info) for every
    vertex appearing as a source or target. ``authority`` is the
    authority-chain distribution after ``steps`` full steps (L1 mass
    1 up to float reassociation); ``hub`` is the hub-side half-step
    distribution of the same iteration. Vertices with no in-edges have
    authority 0; no out-edges, hub 0.
    """
    if num_partitions == "auto":
        P = max(
            spark.sparkContext.defaultParallelism,
            min(200_000, -(-edges.count() // 1_000_000)),
        )
    else:
        P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    base = edges.select("src", "dst").distinct()
    outd = base.groupBy("src").agg(F.count("*").alias("outdeg"))
    ind = base.groupBy("dst").agg(F.count("*").alias("indeg"))
    # TWO copies of the factored edge set, one per half-step join key:
    # the hub half-step joins on dst, the authority half-step on src. A
    # single src-partitioned copy (the r5 shape) forced a full edge
    # shuffle inside EVERY hub half-step — the classic space-for-shuffle
    # trade (guide §2.4): materialize each partitioning once, reuse it
    # ``steps`` times.
    ew = (
        base.join(outd, "src")
        .join(ind, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("outdeg")).alias("inv_out"),
            (F.lit(1.0) / F.col("indeg")).alias("inv_in"),
        )
        # materialized ONCE so the two repartitions below re-read blocks
        # instead of each re-running the distinct + degree joins
        .localCheckpoint(eager=True)
    )
    e = ew.repartition(P, "src").persist()
    e_dst = ew.repartition(P, "dst").persist()
    vertices = G.vertices_from_edges(e).repartition(P, "id").persist()

    n_auth = vertices.join(
        ind.select(F.col("dst").alias("id")), "id", "left_semi"
    ).count()
    if n_auth == 0:
        out = vertices.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        ).localCheckpoint(eager=True)
        e.unpersist()
        e_dst.unpersist()
        vertices.unpersist()
        info.supersteps = 0
        info.converged = True
        info.stop_reason = "empty"
        info.wall_seconds = _time.monotonic() - t0
        return out, info

    # a_0: uniform over vertices with >= 1 in-edge
    auth = (
        e.select(F.col("dst").alias("id"))
        .distinct()
        .select("id", (F.lit(1.0) / F.lit(float(n_auth))).alias("authority"))
    )

    hub = None
    for step in range(steps):
        # hub half-step: pull authority mass backward along in-edges,
        # split by the authority's in-degree
        hub = (
            e_dst.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("authority") * F.col("inv_in")).alias("hub"))
            .withColumnRenamed("src", "id")
        )
        # authority half-step: push hub mass forward along out-edges,
        # split by the hub's out-degree
        auth = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("hub") * F.col("inv_out")).alias("authority"))
            .withColumnRenamed("dst", "id")
        )
        # localCheckpoint per iteration is LOAD-BEARING: it truncates
        # the logical plan to a LogicalRDD leaf. A persist()-only chain
        # keeps the nested plan, and Spark 4 renders a FORMATTED plan
        # string for the UI on every action (spark.sql.ui.explainMode),
        # whose operator-ID walk blows up combinatorially on nested
        # InMemoryRelations — measured as a multi-minute stall at 6
        # steps. The checkpoint blocks are reclaimed by the
        # ContextCleaner once the loop drops its reference (unpersist()
        # is a no-op on checkpoint RDDs — they bypass the cache
        # manager).
        auth = auth.repartition(P, "id").localCheckpoint(eager=False)
        info.per_step.append({"superstep": step + 1, "wall_ms": None})

    out = (
        vertices.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    e_dst.unpersist()
    vertices.unpersist()
    info.supersteps = steps
    info.converged = True
    info.stop_reason = "steps"
    info.wall_seconds = _time.monotonic() - t0
    return out, info
