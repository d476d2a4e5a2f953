"""Maximal independent set — deterministic hash-priority rounds.

Beyond-reference graph primitive (Luby, SIAM J. Comput. 1986, made
deterministic): MIS is the standard building block the reference's
vertex-centric model is routinely used for (its vertex-coloring
example, examples/VertexColoring.scala, greedily builds independent
color classes — MIS is that primitive isolated), and in an LLM data
pipeline it is the keep-set selector for pairwise-conflict graphs
(e.g. "drop one of every near-duplicate pair" = independent set in
the duplicate graph).

Each vertex gets a content-decorrelated priority (portable md5-60
hash of its id, ties by id). A round then does, entirely with joins +
one keyed min:

    IN  <- undecided v whose priority is smaller than every
           undecided neighbor's (or with no undecided neighbor)
    OUT <- undecided neighbors of new IN vertices

Two adjacent vertices can never both win a round (one of the two
priorities is smaller), so IN stays independent by construction; when
no vertex is undecided the set is maximal. The number of rounds is a
FIXED parameter rather than convergence-driven so the result is a
pure function of the input — the DuckDB oracle replays the identical
rounds — and vertices still undecided after ``rounds`` are returned
marked as such (with hash priorities the expected round count is
O(log n), so the default converges far below web scale's log).

Scale shape per round: one equi hash-join edge⋈vertex (shuffle keyed
on the vertex id), one map-side-combined MIN per vertex, two
left-anti/semi prunes — the PageRank-superstep plan shape; the
frontier SHRINKS geometrically (each round decides a constant
fraction in expectation), so later rounds are cheap. No driver-side
graph state; the only per-round action is the emptiness check.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.superstep import ExecutionInfo, loop_aqe_off


@loop_aqe_off
def maximal_independent_set(
    spark,
    edges: DataFrame,
    *,
    rounds: int = 12,
    hash_fn: str = "portable",
    seed: str = "mis|",
    num_partitions: int | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Deterministic MIS over the UNDIRECTED view of ``edges``
    (src, dst; self-loops dropped). Returns
    (DF[id, status: 'in'|'out'|'undecided', round: int], info) — round
    is the 1-based round that decided the vertex (0 if undecided).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    base = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        base.unionAll(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    hk = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col("id").cast("string")))
    # per-round localCheckpoint on the loop state: the winner set
    # references verts twice and e once, so chained lazily the logical
    # plan grows ~5x per round and the analyzer OOMs near round 8 (the
    # iterative-join-chain lesson from star CC / the crawler).
    # eager=False — truncation of the LOGICAL plan is what matters;
    # materialization happens once, on the round's emptiness action,
    # instead of paying 3 extra setup jobs per round. Old checkpoint
    # blocks are reclaimed by the ContextCleaner as soon as the loop
    # drops its reference.
    verts = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select("id", hk.alias("hk"))
        .repartition(P, "id")
        .localCheckpoint(eager=False)
    )
    e = und.repartition(P, "dst").localCheckpoint(eager=False)

    decided: list[DataFrame] = []
    done_round = 0
    for r in range(1, rounds + 1):
        if verts.isEmpty():
            break
        done_round = r
        # min undecided-neighbor priority, keyed on the edge source
        nm = (
            e.join(
                verts.select(F.col("id").alias("dst"), F.col("hk").alias("hk_d")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min(F.struct(F.col("hk_d").alias("hk"), F.col("dst").alias("id"))).alias("m"))
        )
        winners = (
            verts.join(nm, verts["id"] == nm["src"], "left")
            .filter(
                F.col("m").isNull()
                | (
                    F.struct(
                        F.col("hk").alias("hk"), verts["id"].alias("id")
                    )
                    < F.col("m")
                )
            )
            .select(verts["id"])
        )
        outs = (
            e.join(winners.select(F.col("id").alias("src")), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = (
            winners.select("id", F.lit("in").alias("status"), F.lit(r).alias("round"))
            .unionAll(
                outs.select("id", F.lit("out").alias("status"), F.lit(r).alias("round"))
            )
            .localCheckpoint(eager=False)
        )
        decided.append(new)
        verts = (
            verts.join(new.select("id"), "id", "left_anti")
            .repartition(P, "id")
            .localCheckpoint(eager=False)
        )
        e = (
            e.join(verts.select(F.col("id").alias("src")), "src", "left_semi")
            .join(verts.select(F.col("id").alias("dst")), "dst", "left_semi")
            .repartition(P, "dst")
            .localCheckpoint(eager=False)
        )
        info.per_step.append({"superstep": r, "wall_ms": None})

    out = verts.select(
        "id", F.lit("undecided").alias("status"), F.lit(0).alias("round")
    )
    for d in decided:
        out = out.unionAll(d)
    out = out.localCheckpoint(eager=True)
    info.supersteps = done_round
    # converged means NO vertex is left undecided: always true when the
    # loop broke early; when the round cap was hit, ask the frontier
    # (one extra action only in that rare truncated case).
    info.converged = done_round < rounds or verts.isEmpty()
    info.stop_reason = "converged" if info.converged else "max_steps"
    info.wall_seconds = _time.monotonic() - t0
    return out, info
