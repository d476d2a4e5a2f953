"""Independent-cascade influence spread — deterministic seeded IC.

Beyond-reference link-graph operator: the independent-cascade (IC)
model (Kempe, Kleinberg & Tardos, KDD'03 "Maximizing the spread of
influence") is the standard influence-propagation primitive on link
graphs — the inner loop of influence maximization, spam-spread and
cascade-failure analysis. A vertex activated at round r makes ONE
attempt to activate each out-neighbor, succeeding independently with
probability p; since each vertex activates at most once, every edge
flips exactly one coin ever.

The coin is deterministic here: edge (u, v) fires iff

    (H(seed || u || '|' || v) mod 2^40) / 2^40  <  p

— a pure function of the edge, so the full cascade is reproducible
across runs, partitionings AND engines (the SQL oracle replays the
identical coins; the comparison is between the same two IEEE doubles
on both sides, so there is no summation-order risk at all). This is
exactly the live-edge ("coin-flip in advance") formulation of IC from
the KDT'03 proof: the cascade equals BFS over the subgraph of edges
whose coin came up heads.

Scale shape: identical to the engine's BFS pattern — the edge set
shuffles once (hash-partitioned on src, persisted, the coin filter
applied ONCE at cache time so every round re-reads only live edges);
each round is one hash-join + distinct + anti-join against the
activated set. Frontiers localCheckpoint per round; one emptiness
action per round on a shrinking frontier.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.superstep import ExecutionInfo

FRAC_MOD = 1 << 40


def independent_cascade(
    spark,
    edges: DataFrame,
    *,
    seeds: DataFrame | None = None,
    n_seeds: int = 4,
    prob: float = 0.3,
    max_rounds: int = 16,
    seed: str = "ic|",
    hash_fn: str = "portable",
    num_partitions: int | str | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Run one deterministic IC cascade over the DIRECTED edge set.

    Returns (DF[id, round], info): one row per activated vertex with
    the round it activated (0 = seed). Seed set = ``seeds`` (DF with an
    ``id`` column) if given, else the ``n_seeds`` vertices ranking
    first by the portable 60-bit hash of ``seed || 's|' || id`` —
    deterministic and SQL-replayable. Edge (u, v) is LIVE iff
    ``(H(seed||u||'|'||v) mod 2^40)/2^40 < prob``; the cascade is BFS
    over live edges from the seeds (the KKT'03 live-edge equivalence),
    truncated at ``max_rounds``.
    """
    if not (0.0 <= prob <= 1.0):
        raise ValueError("prob must be in [0, 1]")
    if n_seeds < 1:
        raise ValueError("n_seeds must be >= 1")
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    pairs = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    coin = hash_fn_column(
        hash_fn,
        F.concat(
            F.lit(seed),
            F.col("src").cast("string"),
            F.lit("|"),
            F.col("dst").cast("string"),
        ),
    )
    live = (
        pairs.filter(
            F.pmod(coin, F.lit(FRAC_MOD)).cast("double") / F.lit(float(FRAC_MOD))
            < F.lit(float(prob))
        )
        .repartition(P, "src")
        .persist()
    )

    if seeds is None:
        verts = (
            pairs.select(F.col("src").alias("id"))
            .unionAll(pairs.select(F.col("dst").alias("id")))
            .distinct()
        )
        seeds = verts.orderBy(
            hash_fn_column(
                hash_fn,
                F.concat(F.lit(seed), F.lit("s|"), F.col("id").cast("string")),
            ),
            F.col("id"),
        ).limit(n_seeds)

    frontier = (
        seeds.select(F.col("id"), F.lit(0).cast("int").alias("round"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    activated = frontier
    for r in range(1, max_rounds + 1):
        nxt = (
            frontier.select(F.col("id").alias("src"))
            .join(live, "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(activated.select("id"), "id", "left_anti")
            .withColumn("round", F.lit(r).cast("int"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            info.converged = True
            break
        activated = (
            activated.unionAll(nxt)
            .repartition(P, "id")
            .localCheckpoint(eager=False)
        )
        frontier = nxt
        info.supersteps = r
        info.per_step.append({"superstep": r, "wall_ms": None})

    result = activated.localCheckpoint(eager=True)
    live.unpersist()
    info.stop_reason = "converged" if info.converged else "max_steps"
    info.wall_seconds = _time.monotonic() - t0
    return result, info
