"""Landmark distance sketches — scalable point-to-point distances.

Beyond-reference link-graph operator: exact all-pairs shortest paths is
O(V·E) and dead at link-graph scale; the standard scalable answer is a
LANDMARK (a.k.a. distance-oracle / sketch) scheme (Das Sarma et al.,
WSDM'10 "A sketch-based distance oracle for web-scale graphs"): BFS
from k hash-chosen pivot vertices once, store (vertex, landmark, dist),
and answer dist(u, v) <= min over landmarks d(u, l) + d(l, v) at query
time with one hash join. The BFS pass is the engine's standard
frontier-join + keyed-min superstep (the same dataflow as `sssp`,
reference examples/Sssp.scala:32-79, run from k sources at once with
state keyed by (landmark, vertex)).

Scale shape: edges shuffle ONCE (hash-partitioned on src, persisted);
per level one hash-join + map-side-combined min keyed on (landmark,
dst), anti-joined against the visited set — k bounds state at k×|V|
rows. Frontiers localCheckpoint per level; the only per-level action is
the emptiness probe on a shrinking frontier. No Python, no windows, no
collect.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.superstep import ExecutionInfo


def landmark_distances(
    spark,
    edges: DataFrame,
    *,
    landmarks: DataFrame | None = None,
    n_landmarks: int = 8,
    max_depth: int = 16,
    undirected: bool = True,
    seed: str = "lmk|",
    hash_fn: str = "portable",
    num_partitions: int | str | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """BFS hop distances from ``n_landmarks`` pivots.

    Returns (DF[id, landmark, dist], info): one row per (vertex,
    landmark) pair with the vertex reachable from the landmark within
    ``max_depth`` hops (dist 0 = the landmark itself). Landmarks =
    ``landmarks`` (DF with an ``id`` column) if given, else the
    ``n_landmarks`` vertices ranking first by the portable 60-bit hash
    of ``seed || id`` (ties by id) — deterministic, decorrelated from
    id locality, replayable in ANSI SQL.

    Query-time upper bound: ``dist(u,v) <= min_l d(u,l) + d(l,v)`` —
    two probes of this table. Exact on trees and for u or v a landmark;
    an upper bound otherwise (tighter as k grows — the standard
    sketch trade-off).
    """
    if n_landmarks < 1:
        raise ValueError("n_landmarks must be >= 1")
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
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
    if landmarks is None:
        landmarks = verts.orderBy(
            hash_fn_column(
                hash_fn, F.concat(F.lit(seed), F.col("id").cast("string"))
            ),
            F.col("id"),
        ).limit(n_landmarks)

    frontier = (
        landmarks.select(
            F.col("id").alias("landmark"),
            F.col("id"),
            F.lit(0).cast("int").alias("dist"),
        )
        .repartition(P, "landmark", "id")
        .localCheckpoint(eager=True)
    )
    out = frontier
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.select("landmark", F.col("id").alias("src"))
            .join(e, "src")
            .select("landmark", F.col("dst").alias("id"))
            .distinct()
            .join(out.select("landmark", "id"), ["landmark", "id"], "left_anti")
            .withColumn("dist", F.lit(d).cast("int"))
            .repartition(P, "landmark", "id")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            info.converged = True
            break
        out = (
            out.unionAll(nxt)
            .repartition(P, "landmark", "id")
            .localCheckpoint(eager=False)
        )
        frontier = nxt
        info.supersteps = d
        info.per_step.append({"superstep": d, "wall_ms": None})

    result = out.select("id", "landmark", "dist").localCheckpoint(eager=True)
    e.unpersist()
    info.stop_reason = "converged" if info.converged else "max_steps"
    info.wall_seconds = _time.monotonic() - t0
    return result, info


def closeness_topk(
    spark,
    edges: DataFrame,
    *,
    k: int = 20,
    n_sources: int = 8,
    max_depth: int = 16,
    undirected: bool = True,
    seed: str = "cls|",
    hash_fn: str = "portable",
    num_partitions: int | str | None = None,
) -> DataFrame:
    """Sampled-source closeness centrality (Eppstein & Wang, SODA'01
    "Fast approximation of centrality"): estimate each vertex's
    closeness from BFS distances to ``n_sources`` hash-chosen pivots —
    the same k x |V| sketch :func:`landmark_distances` builds, read
    column-wise instead of row-wise.

    Estimator: for a vertex v reached by ALL ``n_sources`` pivots,

        closeness_hat(v) = n_sources / SUM_s d(v, s)

    (the reciprocal mean pivot distance; Eppstein-Wang's n/(n-1)-style
    population rescale is a constant factor that cancels under top-k
    ranking, so the simple reciprocal form is reported). Vertices not
    reached by every pivot within ``max_depth`` are excluded — the
    partial sums are not comparable (a vertex missing its FARTHEST
    pivot would look more central, not less). Pivots themselves are
    ranked too (their own 0 term is part of the sum).

    Returns the top-``k`` DataFrame[id, sum_dist, closeness] ranked by
    the 9-dp-rounded score (ties by id ascending) — both engines cut
    on the same grid; sum_dist is an exact long so the division is
    bit-identical.

    Scale shape: everything :func:`landmark_distances` does (edges
    shuffle once, k x |V| bounded state, per-level keyed-min join) plus
    ONE groupBy(id) with a count-filter and a TakeOrdered top-k — no
    window, no Python. Error bound (Eppstein-Wang thm 1): with
    k = Theta(log n / eps^2) pivots the estimate is within eps * diameter
    whp; n_sources is that knob.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sketch, _info = landmark_distances(
        spark,
        edges,
        n_landmarks=n_sources,
        max_depth=max_depth,
        undirected=undirected,
        seed=seed,
        hash_fn=hash_fn,
        num_partitions=num_partitions,
    )
    full = (
        sketch.groupBy("id")
        .agg(
            F.count("*").alias("__n_reached"),
            F.sum("dist").cast("long").alias("sum_dist"),
        )
        .filter(
            (F.col("__n_reached") == F.lit(n_sources)) & (F.col("sum_dist") > 0)
        )
    )
    scored = full.select(
        "id",
        "sum_dist",
        F.round(F.lit(float(n_sources)) / F.col("sum_dist"), 9).alias("closeness"),
    )
    return scored.orderBy(F.col("closeness").desc(), F.col("id")).limit(k)
