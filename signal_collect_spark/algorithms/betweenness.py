"""Betweenness centrality — sampled-source Brandes as superstep joins.

Beyond-reference link-graph operator: betweenness is the classic
shortest-path centrality missing from the engine's ranking family
(PageRank / HITS / SALSA / Katz / harmonic). The reference's dataflow
model covers it naturally — Brandes' algorithm (Brandes 2001, "A
faster algorithm for betweenness centrality") is two superstep-shaped
passes per source: a forward BFS that counts shortest paths and a
backward sweep that accumulates path dependencies — both expressible
as the engine's standard frontier-join + keyed-sum shape (the same
signal/collect pattern as `sssp`, reference examples/Sssp.scala:32-79,
with sigma playing the summable-signal role).

Exact betweenness needs one BFS per vertex — O(V·E), infeasible at
link-graph scale — so this is the *sampled* estimator (Brandes & Pich
2007): run Brandes from ``n_sources`` pivot sources and sum the
dependencies. The pivot set is chosen by a portable content-hash
ordering (decorrelated from vertex-id locality, replayable by an
ANSI-SQL oracle), or supplied explicitly.

Scale shape: the edge set is shuffled ONCE (hash-partitioned on src,
persisted); state is keyed by (source, vertex) so the frontier carries
at most ``n_sources × |V|`` rows — the sampling knob bounds memory and
work linearly. Each forward level is one hash-join with the cached
edges + one map-side-combined sum keyed on the destination; each
backward level is the same join shape against the next level's
dependencies. Per-level frontiers are localCheckpoint'ed (lineage
truncation — the star-CC lesson) and the only per-level action is the
emptiness probe on a shrinking frontier. No windows, no Python UDFs,
no collect.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.superstep import ExecutionInfo


def betweenness(
    spark,
    edges: DataFrame,
    *,
    sources: DataFrame | None = None,
    n_sources: int = 8,
    max_depth: int = 16,
    undirected: bool = True,
    seed: str = "btw|",
    hash_fn: str = "portable",
    num_partitions: int | str | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Sampled-source Brandes betweenness over ``edges``.

    Returns (DF[id, betweenness: double], info): for every vertex
    reached at distance >= 1 from at least one pivot source, the sum
    over pivots of Brandes' dependency delta(s, v) — the UNSCALED
    sampled estimator (multiply by |V|/n_sources for the Brandes-Pich
    extrapolation; left to the caller so the raw value stays
    oracle-replayable). With ``undirected=True`` (edges symmetrized
    here) each unordered pair is discovered twice, so the sum is
    halved — the classic undirected convention.

    Pivot sources: ``sources`` (DF with an ``id`` column) if given,
    else the ``n_sources`` vertices ranking first by the portable
    60-bit hash of ``seed || id`` (ties by id) — deterministic,
    decorrelated from id order, and replayable in ANSI SQL.

    Forward pass (levels 0..D, D <= ``max_depth``): level d holds
    (source, vertex, sigma) where sigma = number of distinct shortest
    s->v paths = sum of predecessors' sigmas (exact in doubles up to
    2^53 paths). Backward pass: delta(v) = sum over successors w of
    sigma(v)/sigma(w) * (1 + delta(w)), one keyed sum per level in
    decreasing distance — Brandes' accumulation, reference-free.
    """
    if n_sources < 1:
        raise ValueError("n_sources must be >= 1")
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    e_raw = edges.select("src", "dst")
    if undirected:
        e_raw = e_raw.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = (
        e_raw.filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(P, "src")
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )

    if sources is None:
        sources = verts.orderBy(
            hash_fn_column(
                hash_fn, F.concat(F.lit(seed), F.col("id").cast("string"))
            ),
            F.col("id"),
        ).limit(n_sources)

    level0 = (
        sources.select(
            F.col("id").alias("source"),
            F.col("id"),
            F.lit(1.0).alias("sigma"),
        )
        .repartition(P, "source", "id")
        .localCheckpoint(eager=True)
    )
    levels: list[DataFrame] = [level0]
    visited = level0.select("source", "id")

    # ---- forward: BFS levels with shortest-path counts --------------
    for d in range(1, max_depth + 1):
        frontier = levels[-1]
        cand = (
            frontier.select(
                "source", F.col("id").alias("src"), "sigma"
            )
            .join(e, "src")
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = (
            cand.join(visited, ["source", "id"], "left_anti")
            .repartition(P, "source", "id")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = (
            visited.unionAll(nxt.select("source", "id"))
            .repartition(P, "source", "id")
            .localCheckpoint(eager=False)
        )
        info.per_step.append({"superstep": d, "wall_ms": None})

    D = len(levels) - 1
    info.supersteps = D
    info.converged = D < max_depth
    info.stop_reason = "converged" if info.converged else "max_steps"

    # ---- backward: dependency accumulation, deepest level first -----
    delta_next = levels[D].withColumn("delta", F.lit(0.0))
    acc: list[DataFrame] = []
    if D >= 1:
        acc.append(delta_next)
    for d in range(D - 1, -1, -1):
        succ = delta_next.select(
            "source",
            F.col("id").alias("dst"),
            F.col("sigma").alias("w_sigma"),
            F.col("delta").alias("w_delta"),
        )
        contrib = (
            levels[d]
            .select("source", F.col("id").alias("src"), "sigma")
            .join(e, "src")
            .join(succ, ["source", "dst"])
            .groupBy("source", F.col("src").alias("id"))
            .agg(
                F.sum(
                    F.col("sigma")
                    / F.col("w_sigma")
                    * (F.lit(1.0) + F.col("w_delta"))
                ).alias("dep")
            )
        )
        delta_next = (
            levels[d]
            .join(contrib, ["source", "id"], "left")
            .select(
                "source",
                "id",
                "sigma",
                F.coalesce("dep", F.lit(0.0)).alias("delta"),
            )
            .repartition(P, "source", "id")
            .localCheckpoint(eager=False)
        )
        if d >= 1:  # the source's own delta is not betweenness
            acc.append(delta_next)

    if acc:
        out = acc[0]
        for df in acc[1:]:
            out = out.unionAll(df)
        scale = F.lit(0.5) if undirected else F.lit(1.0)
        result = (
            out.groupBy("id")
            .agg((F.sum("delta") * scale).alias("betweenness"))
        )
    else:  # no vertex reachable at distance >= 1
        result = level0.select("id", F.lit(0.0).alias("betweenness")).limit(0)

    result = result.localCheckpoint(eager=True)
    e.unpersist()
    for lv in levels:
        info.caches.append(lv)
    info.wall_seconds = _time.monotonic() - t0
    return result, info
