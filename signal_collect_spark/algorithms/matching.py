"""Maximal matching — deterministic hash-priority edge rounds.

Beyond-reference graph primitive, the edge-side sibling of the MIS
rounds (mis.py): a maximal matching pairs vertices so no two chosen
edges share an endpoint and no unchosen edge has both endpoints free.
In an LLM data pipeline this is the canonical PAIRER — e.g. match each
near-duplicate document to one partner for pairwise contrastive
training, or reduce an entity-resolution candidate graph to disjoint
merge pairs (Israeli & Itai 1986 give the classic distributed
formulation; this is its deterministic greedy fixpoint).

Each UNDIRECTED edge gets a content-decorrelated priority (portable
md5-60 hash of its canonical "lo|hi" endpoint pair, ties by the pair
itself). A round then does, entirely with joins + keyed mins:

    MATCH <- live edge that is the priority minimum at BOTH its
             endpoints (local minima can't share an endpoint, so the
             round's picks are vertex-disjoint by construction)
    DROP  <- live edges sharing an endpoint with a new MATCH edge

When no live edge remains, the matching is maximal: an edge only ever
leaves via DROP, which requires a matched endpoint. The round count is
a FIXED parameter so the result is a pure function of the input (the
DuckDB oracle unrolls the identical rounds); greedy-by-priority rounds
halve the live set geometrically in expectation, so the default
converges far below web scale's log.

Scale shape per round: ONE map-side-combined min per endpoint (the
edge table exploded to (vertex, edge) incidences), one equi join of
the live edges with the two per-endpoint minima, one left-semi drop —
no broadcast of anything O(|V|), no driver-side graph state; the only
per-round action is the emptiness check. The matched result equals the
sequential greedy matching in (hash, lo, hi) order — the same unique
fixpoint argument as mis.py.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.superstep import ExecutionInfo


def maximal_matching(
    spark,
    edges: DataFrame,
    *,
    rounds: int = 12,
    hash_fn: str = "portable",
    seed: str = "mm|",
    num_partitions: int | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Deterministic maximal matching over the UNDIRECTED view of
    ``edges`` (src, dst; self-loops dropped). Returns
    (DF[lo, hi, matched: boolean, round: int], info): one row per
    distinct undirected edge (lo < hi), ``matched`` rows form the
    matching, unmatched rows carry the round that dropped them
    (0 = still live after ``rounds`` — undecided).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = _time.monotonic()
    info = ExecutionInfo()

    base = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    hk = hash_fn_column(
        hash_fn,
        F.concat(
            F.lit(seed),
            F.col("lo").cast("string"),
            F.lit("|"),
            F.col("hi").cast("string"),
        ),
    )
    live = (
        base.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .distinct()
        .select("lo", "hi", hk.alias("hk"))
        .repartition(P, "lo", "hi")
        .localCheckpoint(eager=False)
    )

    decided: list[DataFrame] = []
    done_round = 0
    for r in range(1, rounds + 1):
        if live.isEmpty():
            break
        done_round = r
        # (vertex, edge-priority) incidences; per-vertex minimum
        inc = live.select(
            F.explode(F.array("lo", "hi")).alias("v"),
            F.struct(
                F.col("hk").alias("hk"), F.col("lo").alias("lo"), F.col("hi").alias("hi")
            ).alias("p"),
        )
        vmin = inc.groupBy("v").agg(F.min("p").alias("m"))
        own = F.struct(
            F.col("hk").alias("hk"), F.col("lo").alias("lo"), F.col("hi").alias("hi")
        )
        # matched = local minimum at BOTH endpoints
        matched = (
            live.join(vmin.select(F.col("v").alias("lo"), F.col("m").alias("mlo")), "lo")
            .join(vmin.select(F.col("v").alias("hi"), F.col("m").alias("mhi")), "hi")
            .filter((own == F.col("mlo")) & (own == F.col("mhi")))
            .select("lo", "hi", "hk")
        )
        touched = matched.select(F.explode(F.array("lo", "hi")).alias("v")).distinct()
        dropped = (
            live.join(matched.select("lo", "hi"), ["lo", "hi"], "left_anti")
            .join(touched.withColumnRenamed("v", "lo"), "lo", "left_semi")
            .select("lo", "hi")
            .unionAll(
                live.join(matched.select("lo", "hi"), ["lo", "hi"], "left_anti")
                .join(touched.withColumnRenamed("v", "hi"), "hi", "left_semi")
                .select("lo", "hi")
            )
            .distinct()
        )
        new = (
            matched.select(
                "lo", "hi", F.lit(True).alias("matched"), F.lit(r).alias("round")
            )
            .unionAll(
                dropped.select(
                    "lo", "hi", F.lit(False).alias("matched"), F.lit(r).alias("round")
                )
            )
            .localCheckpoint(eager=False)
        )
        decided.append(new)
        live = (
            live.join(new.select("lo", "hi"), ["lo", "hi"], "left_anti")
            .repartition(P, "lo", "hi")
            .localCheckpoint(eager=False)
        )
        info.per_step.append({"superstep": r, "wall_ms": None})

    out = live.select(
        "lo", "hi", F.lit(False).alias("matched"), F.lit(0).alias("round")
    )
    for d in decided:
        out = out.unionAll(d)
    out = out.localCheckpoint(eager=True)
    info.supersteps = done_round
    # converged means no live edge remains: always true on early break;
    # on a hit round cap ask the frontier (one extra action, rare case).
    info.converged = done_round < rounds or live.isEmpty()
    info.stop_reason = "converged" if info.converged else "max_steps"
    info.wall_seconds = _time.monotonic() - t0
    return out, info
