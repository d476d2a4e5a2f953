"""k-core decomposition via distributed iterative peeling.

Beyond-reference link-graph operator (the reference's aggregation
surface — e.g. ``TopDegree``/degree analytics, Graph.scala:66-90 —
stops at one-hop degree queries; k-core is the standard next step for
web/link-graph cohesion analysis: the maximal subgraph in which every
vertex has degree >= k within the subgraph).

Algorithm: repeatedly delete vertices of degree < k (with their
incident edges) until none remain. The surviving vertex set is the
k-core — unique and independent of deletion order, so the distributed
batch peeling below (delete ALL under-degree vertices each round) is
exact.

Scale shape: each round is one degree aggregate (hash shuffle on the
vertex id) plus two semi-joins filtering the current edge set — the
edge set only shrinks, so per-round cost is bounded by the input scan
and AQE picks broadcast semi-joins once the survivor set is small.
Convergence needs no fingerprint: the edge count strictly decreases
every non-final round, so an unchanged count IS the fixpoint (exact,
one tiny aggregate per round — the same action that materializes the
round's localCheckpoint). Rounds are bounded by the peeling depth
(<= max degeneracy ordering depth, typically tens on web graphs).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo


def _auto_partitions(spark, edges: DataFrame, num_partitions) -> int:
    if num_partitions == "auto":
        return max(
            spark.sparkContext.defaultParallelism,
            min(200_000, -(-edges.count() // 1_000_000)),
        )
    return num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))


def k_core(
    spark,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 200,
    num_partitions: int | str | None = "auto",
) -> tuple[DataFrame, ExecutionInfo]:
    """Vertices of the k-core of the UNDIRECTED simple graph under
    ``edges``, with their within-core degree.

    Returns (DF[id: long, core_degree: long], info) — empty when the
    graph has no k-core. ``info.supersteps`` = peel rounds (the final
    no-change round included), ``info.per_step`` carries the surviving
    edge count per round.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    P = _auto_partitions(spark, edges, num_partitions)
    t0 = _time.monotonic()
    info = ExecutionInfo()

    # canonical undirected pair set, no self-loops (degree = simple-graph
    # neighbour count, the standard k-core definition)
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
        deg = (
            e.select(F.col("a").alias("u"))
            .unionAll(e.select(F.col("b").alias("u")))
            .groupBy("u")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("u")
        # lineage cut every round: the peeled set feeds the next round's
        # degree agg AND both semi-joins (same blow-up mode as star CC)
        new_e = (
            e.join(keep.withColumnRenamed("u", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("u", "b"), "b", "left_semi")
            .select("a", "b")
            .repartition(P, "a")
            .localCheckpoint(eager=False)
        )
        n = new_e.count()
        e = new_e
        rounds = rnd + 1
        info.per_step.append({"superstep": rounds, "edges": n, "wall_ms": None})
        if n == prev_n:
            # nothing deleted ⇒ every remaining vertex has deg >= k
            info.converged = True
            info.stop_reason = "converged"
            break
        prev_n = n
    info.supersteps = rounds

    out = (
        e.select(F.col("a").alias("u"))
        .unionAll(e.select(F.col("b").alias("u")))
        .groupBy(F.col("u").alias("id"))
        .agg(F.count("*").alias("core_degree"))
        .localCheckpoint(eager=True)
    )
    first.unpersist()
    info.wall_seconds = _time.monotonic() - t0
    return out, info


def core_number(
    spark,
    edges: DataFrame,
    *,
    max_k: int = 1000,
    num_partitions: int | str | None = "auto",
) -> tuple[DataFrame, ExecutionInfo]:
    """Full core decomposition: for every vertex the LARGEST k such that
    it belongs to the k-core (isolated-in-simple-graph vertices never
    appear in ``edges`` and are the callers' 0-core).

    Peels k = 1, 2, … reusing the (k-1)-core as the starting graph for
    the k-peel — total work is the telescoping sum of shrinking edge
    sets, and the outer loop runs degeneracy(G)+1 times (tens even on
    web-scale graphs; Facebook's measured degeneracy is a few hundred).
    Returns (DF[id, core: long], info); info.supersteps = total peel
    rounds across all k.
    """
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
    spark_ = spark
    # every vertex present in the simple graph has core >= 1
    assigned = None  # DF[id, core]
    total_rounds = 0
    prev_members = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for k in range(2, max_k + 2):
        core_df, kinfo = k_core(
            spark_, e.select(F.col("a").alias("src"), F.col("b").alias("dst")), k,
            num_partitions=P,
        )
        total_rounds += kinfo.supersteps
        members = core_df.select("id").localCheckpoint(eager=True)
        dropped = prev_members.join(members, "id", "left_anti").withColumn(
            "core", F.lit(k - 1).cast("long")
        )
        assigned = dropped if assigned is None else assigned.unionAll(dropped)
        assigned = assigned.localCheckpoint(eager=True)
        if members.isEmpty():
            break
        # restrict the working graph to the surviving core before the
        # next (tighter) peel — the telescoping reuse
        new_e = (
            e.join(members.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(members.withColumnRenamed("id", "b"), "b", "left_semi")
            .repartition(P, "a")
            .localCheckpoint(eager=True)
        )
        if e is not first:
            e.unpersist()
        e = new_e
        prev_members = members
    else:
        raise RuntimeError(f"core_number did not finish within max_k={max_k}")
    info.supersteps = total_rounds
    info.converged = True
    info.stop_reason = "converged"
    out = assigned.localCheckpoint(eager=True)
    first.unpersist()
    info.wall_seconds = _time.monotonic() - t0
    return out, info
