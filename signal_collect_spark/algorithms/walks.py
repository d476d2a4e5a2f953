"""Deterministic random walks — distributed graph-corpus sampling.

Beyond-reference link-graph operator: fixed-length random walks from
every (or a chosen set of) start vertices, the sampling pass behind
DeepWalk/node2vec-style graph embeddings and behind walk-based corpus
construction on web/link graphs. The reference's traversal surface
(path queries, `modifyGraph` walkers) is driver-directed; this is the
bulk analogue: millions of walks advance one hop per superstep-shaped
join round.

Determinism: the "random" next hop is a pure function of
(seed, walk id, step, current vertex) — a 60-bit portable hash modulo
the vertex out-degree, indexing into the neighbor list sorted by
destination id. No RNG state, so the full walk set is reproducible
across runs, partitionings, AND engines: a SQL oracle replays the
identical choices (see `__spark_entry__.py` random_walks oracle).

Scale shape: adjacency is packed ONCE into (src, sorted neighbor
array, degree) — one shuffle — and persisted hash-partitioned on src.
Each hop is then one join against that cached table + an `element_at`
pick: only the (narrow, 3-column) frontier re-shuffles per hop — it
must, the walk moved — while the adjacency never does. Walk rows are
independent → perfectly
data-parallel; dead ends (out-degree 0) simply stop emitting. The
packed-array layout holds one row per vertex, so a hub with out-degree
d stores a d-element array: bounded by ``max_degree`` (default 1M ≈
8 MB/row) with a loud error pointing hub-heavy graphs at pre-capping
(sample ``max_degree`` neighbors per hub with `hash_fraction_sample`
semantics) rather than silently truncating.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.superstep import ExecutionInfo, loop_aqe_off


FRAC_MOD = 1 << 40  # 40-bit hash fraction: exact double, both engines


@loop_aqe_off
def random_walks(
    spark,
    edges: DataFrame,
    *,
    walk_len: int = 4,
    walks_per_vertex: int = 1,
    starts: DataFrame | None = None,
    seed: str = "walk|",
    hash_fn: str = "portable",
    weight_col: str | None = None,
    max_degree: int = 1_000_000,
    num_partitions: int | str | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Run ``walks_per_vertex`` deterministic walks of ``walk_len`` hops
    from every start vertex over the DIRECTED edge set.

    Returns (DF[start_id, walk, step, vertex], info): one row per
    visited position, step 0 = the start vertex itself. A walk that
    reaches a vertex with no out-edges ends there (no padding rows).
    ``starts`` (DF with an ``id`` column) restricts the start set;
    default = every vertex appearing as a source or destination.

    Next hop from vertex v at step t in walk w:
    ``neighbors(v)[ H(seed||w||'|'||t||'|'||v) mod outdeg(v) ]`` with
    neighbors sorted ascending — a pure function, so reproducible
    anywhere the hash is (hash_fn='portable' == md5-60, replayable in
    ANSI SQL; 'xxhash64' is the JVM fast path).

    ``weight_col`` switches to weight-proportional sampling: parallel
    (src, dst) duplicates are summed, cumulative weights are folded
    left-to-right over the dst-sorted neighbor list, and the hop picks
    the first neighbor whose running total exceeds
    ``(H mod 2^40) / 2^40 * total_weight``. Every arithmetic step is a
    single IEEE-754 op in a pinned order, so an ANSI-SQL engine replays
    the identical choices; with integer-valued weights (< 2^53 per
    adjacency) the running totals are exact and even the summation
    order stops mattering.
    """
    if walk_len < 0:
        raise ValueError("walk_len must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    if weight_col is None:
        pairs = (
            edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        adj = (
            pairs.groupBy("src")
            .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
            .select("src", "nbrs", F.size("nbrs").cast("long").alias("deg"))
            .repartition(P, "src")
            .persist()
        )
    else:
        pairs = (
            edges.select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        # sort_array on struct(dst, w) orders by dst (unique per src);
        # cumw is a strict left fold, the order the SQL oracle replays
        adj = (
            pairs.groupBy("src")
            .agg(F.sort_array(F.collect_list(F.struct("dst", "w"))).alias("nb"))
            .select(
                "src",
                F.transform("nb", lambda x: x["dst"]).alias("nbrs"),
                F.expr(
                    "aggregate(nb, cast(array() as array<double>), (acc, x) -> "
                    "array_append(acc, if(size(acc) = 0, x.w, "
                    "element_at(acc, size(acc)) + x.w)))"
                ).alias("cumw"),
            )
            .select(
                "src",
                "nbrs",
                "cumw",
                F.size("nbrs").cast("long").alias("deg"),
                F.element_at("cumw", F.size("cumw")).alias("total_w"),
            )
            .repartition(P, "src")
            .persist()
        )
    worst = adj.agg(F.max("deg")).first()[0] or 0
    if worst > max_degree:
        adj.unpersist()
        raise ValueError(
            f"random_walks: max out-degree {worst} exceeds max_degree="
            f"{max_degree}; pre-cap hub adjacency (deterministic per-hub "
            "neighbor sample) before walking, or raise max_degree"
        )

    if starts is None:
        starts = pairs.select(F.col("src").alias("id")).union(
            pairs.select(F.col("dst").alias("id"))
        ).distinct()
    # explode over a literal array, NOT crossJoin against a tiny table —
    # a CartesianProduct against an n-row literal plans n*P near-empty
    # partitions (measured elsewhere in this repo: game_of_life 154s->10s)
    frontier = (
        starts.select(F.col("id").cast("long").alias("start_id"))
        .withColumn(
            "walk",
            F.explode(F.array(*[F.lit(i).cast("long") for i in range(walks_per_vertex)])),
        )
        .select("start_id", "walk", F.col("start_id").alias("vertex"))
        .repartition(P, "vertex")
    )

    cur = frontier.select(
        "start_id", "walk", F.lit(0).cast("int").alias("step"), "vertex"
    ).localCheckpoint(eager=True)
    traces = [cur]
    for t in range(1, walk_len + 1):
        key = hash_fn_column(
            hash_fn,
            F.concat(
                F.lit(seed),
                F.col("walk").cast("string"),
                F.lit("|"),
                F.lit(str(t)),
                F.lit("|"),
                F.col("vertex").cast("string"),
            ),
        )
        if weight_col is None:
            pick = F.element_at(
                F.col("nbrs"), (F.pmod(key, F.col("deg")) + 1).cast("int")
            )
        else:
            thresh = (
                F.pmod(key, F.lit(FRAC_MOD)).cast("double") / F.lit(float(FRAC_MOD))
            ) * F.col("total_w")
            idx = F.least(
                F.col("deg"),
                (F.size(F.filter(F.col("cumw"), lambda c: c <= thresh)) + 1).cast(
                    "long"
                ),
            )
            pick = F.element_at(F.col("nbrs"), idx.cast("int"))
        stepped = (
            cur.join(adj, cur["vertex"] == adj["src"])
            .select(
                "start_id",
                "walk",
                F.lit(t).cast("int").alias("step"),
                pick.alias("vertex"),
            )
            # intermediate hops chain lazily; the LAST hop materializes
            # the whole chain (each trace RDD-persists on compute) so
            # the adj.unpersist() below stays safe — one job for the
            # walk instead of a checkpoint job + a count job per hop
            .localCheckpoint(eager=t == walk_len)
        )
        info.per_step.append({"step": t})
        traces.append(stepped)
        cur = stepped
    out = traces[0]
    for t in traces[1:]:
        out = out.union(t)
    adj.unpersist()
    info.supersteps = walk_len
    info.wall_seconds = _time.monotonic() - t0
    return out, info


@loop_aqe_off
def node2vec_walks(
    spark,
    edges: DataFrame,
    *,
    walk_len: int = 4,
    walks_per_vertex: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    starts: DataFrame | None = None,
    seed: str = "n2v|",
    hash_fn: str = "portable",
    max_degree: int = 100_000,
    num_partitions: int | str | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Deterministic node2vec-biased walks (Grover & Leskovec, KDD'16).

    Like :func:`random_walks`, but from the second hop on the next-hop
    distribution is biased by where the walk CAME from: candidate
    neighbor ``x`` of the current vertex ``v`` reached from ``prev``
    gets unnormalized weight

        1/p  if x == prev                      (return)
        1    if (prev, x) is an edge           (stay near: distance 1)
        1/q  otherwise                         (explore: distance 2)

    — the in-out/return bias behind node2vec's BFS<->DFS interpolation.
    Low ``p`` keeps walks local (backtracking), low ``q`` pushes them
    outward. The first hop is uniform (no ``prev`` yet), identical to
    :func:`random_walks`. The distance-1 test uses the DIRECTED
    out-neighborhood of ``prev`` (symmetrize the edge set first for the
    paper's undirected semantics).

    Determinism: the hop at step t picks the first neighbor (sorted by
    id) whose left-folded cumulative bias weight exceeds
    ``(H(seed||walk||'|'||t||'|'||vertex) mod 2^40)/2^40 x total`` — a
    pure function, replayed exactly by the SQL oracle. With ``1/p`` and
    ``1/q`` powers of two (the 2.0/0.5 defaults) every partial sum is
    an exact double, so the replay is bit-identical REGARDLESS of the
    oracle engine's summation order; other biases are last-ulp-boundary
    safe only under left-fold order (documented, not default).

    Scale shape: adjacency packs once (one shuffle, persisted on src);
    each hop is TWO joins against that cached table — current vertex
    and prev vertex — plus expression-only bias/fold arithmetic over
    the packed neighbor array (no explode, no Python). A hub of degree
    d costs O(d * deg(prev)) membership tests inside whole-stage
    codegen; ``max_degree`` bounds the packed row exactly as in
    :func:`random_walks`.
    """
    if walk_len < 0:
        raise ValueError("walk_len must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("node2vec p and q must be > 0")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()
    ret_w = 1.0 / p
    out_w = 1.0 / q

    pairs = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    adj = (
        pairs.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .select("src", "nbrs", F.size("nbrs").cast("long").alias("deg"))
        .repartition(P, "src")
        .persist()
    )
    worst = adj.agg(F.max("deg")).first()[0] or 0
    if worst > max_degree:
        adj.unpersist()
        raise ValueError(
            f"node2vec_walks: max out-degree {worst} exceeds max_degree="
            f"{max_degree}; pre-cap hub adjacency before walking, or "
            "raise max_degree"
        )

    if starts is None:
        starts = (
            pairs.select(F.col("src").alias("id"))
            .union(pairs.select(F.col("dst").alias("id")))
            .distinct()
        )
    frontier = (
        starts.select(F.col("id").cast("long").alias("start_id"))
        .withColumn(
            "walk",
            F.explode(
                F.array(
                    *[F.lit(i).cast("long") for i in range(walks_per_vertex)]
                )
            ),
        )
        .select("start_id", "walk", F.col("start_id").alias("vertex"))
        .repartition(P, "vertex")
    )

    def hop_key(t: int):
        return hash_fn_column(
            hash_fn,
            F.concat(
                F.lit(seed),
                F.col("walk").cast("string"),
                F.lit("|"),
                F.lit(str(t)),
                F.lit("|"),
                F.col("vertex").cast("string"),
            ),
        )

    cur = frontier.select(
        "start_id",
        "walk",
        F.lit(0).cast("int").alias("step"),
        "vertex",
        F.lit(None).cast("long").alias("prev"),
    ).localCheckpoint(eager=True)
    traces = [cur.select("start_id", "walk", "step", "vertex")]
    for t in range(1, walk_len + 1):
        if t == 1:
            # uniform first hop: no prev to bias by
            pick = F.element_at(
                F.col("nbrs"), (F.pmod(hop_key(t), F.col("deg")) + 1).cast("int")
            )
            stepped = (
                cur.join(adj, cur["vertex"] == adj["src"])
                .select(
                    "start_id",
                    "walk",
                    F.lit(t).cast("int").alias("step"),
                    pick.alias("new_vertex"),
                    cur["vertex"].alias("prev"),
                )
                .withColumnRenamed("new_vertex", "vertex")
                .select("start_id", "walk", "step", "vertex", "prev")
                .localCheckpoint(eager=t == walk_len)
            )
        else:
            pa = adj.select(
                F.col("src").alias("__pa_src"), F.col("nbrs").alias("__pa_nbrs")
            )
            joined = (
                cur.join(adj, cur["vertex"] == adj["src"])
                .join(pa, cur["prev"] == F.col("__pa_src"))
                .withColumn(
                    "__alphas",
                    F.transform(
                        F.col("nbrs"),
                        lambda n: F.when(n == F.col("prev"), F.lit(ret_w))
                        .when(
                            F.exists(
                                F.col("__pa_nbrs"), lambda m: m == n
                            ),
                            F.lit(1.0),
                        )
                        .otherwise(F.lit(out_w)),
                    ),
                )
                .withColumn(
                    "__thresh",
                    (
                        F.pmod(hop_key(t), F.lit(FRAC_MOD)).cast("double")
                        / F.lit(float(FRAC_MOD))
                    )
                    * F.aggregate(
                        F.col("__alphas"), F.lit(0.0), lambda a, x: a + x
                    ),
                )
                .withColumn(
                    "__pick",
                    F.least(
                        F.col("deg"),
                        F.aggregate(
                            F.col("__alphas"),
                            F.struct(
                                F.lit(0.0).alias("cum"),
                                F.lit(0).cast("long").alias("cnt"),
                            ),
                            lambda acc, x: F.struct(
                                (acc["cum"] + x).alias("cum"),
                                (
                                    acc["cnt"]
                                    + F.when(
                                        acc["cum"] + x <= F.col("__thresh"),
                                        F.lit(1),
                                    )
                                    .otherwise(F.lit(0))
                                    .cast("long")
                                ).alias("cnt"),
                            ),
                            lambda acc: acc["cnt"],
                        )
                        + F.lit(1),
                    ),
                )
            )
            stepped = joined.select(
                "start_id",
                "walk",
                F.lit(t).cast("int").alias("step"),
                F.element_at(F.col("nbrs"), F.col("__pick").cast("int")).alias(
                    "vertex"
                ),
                cur["vertex"].alias("prev"),
            ).localCheckpoint(eager=t == walk_len)
        info.per_step.append({"step": t})
        traces.append(stepped.select("start_id", "walk", "step", "vertex"))
        cur = stepped
    out = traces[0]
    for tr in traces[1:]:
        out = out.union(tr)
    adj.unpersist()
    info.supersteps = walk_len
    info.wall_seconds = _time.monotonic() - t0
    return out, info
