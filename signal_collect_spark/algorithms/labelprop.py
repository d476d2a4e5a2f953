"""Label propagation (Chinese-Whispers-style majority labelling).

Reference semantics (examples/ChineseWhispersClustering.scala:31-54):
state₀ = own id; signal = (source.state, edge.weight) (:52); collect
groups incoming (label, weight) signals PLUS a self-preference
(own state, 1.0), sums weight per label and adopts the strongest
(:35-42). The reference breaks ties by sort order (`sorted.last`,
order-sensitive); we pin the deterministic rule: max total weight,
ties → smallest label (documented deviation, FIXTURES.md §C).

Messages are (label, weight) pairs — not a scalar monoid — so this
drives its own synchronous loop rather than the scalar Kernel. Each
round is still one co-located join + a two-level aggregate:
groupBy(id, label).sum(weight) → argmax via a single max(struct)
aggregate (no window sort, no shuffle beyond the two keyed aggregates;
both get map-side partial aggregation).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, loop_aqe_off


@loop_aqe_off
def label_propagation(
    spark,
    edges: DataFrame,
    *,
    directed: bool = False,
    max_steps: int = 20,
    run_to_convergence: bool = True,
    num_partitions: int | None = None,
    truncate_every: int = 4,
) -> tuple[DataFrame, ExecutionInfo]:
    """Returns (DF[id, label], info). Deterministic: synchronous rounds,
    tie-break = smallest label among max-weight labels.

    ``run_to_convergence=False`` runs exactly ``max_steps`` rounds —
    the mode used for differential testing against a SQL oracle
    (synchronous LP can oscillate on bipartite-ish structures, so a
    fixed round count is the reproducible configuration;
    ≙ ExecutionConfiguration stepsLimit).
    """
    # same lineage-truncation clamp as the superstep engine: task-binary
    # deserialize + plan rendering cost grows ~2x per untruncated round
    # (state feeds the message join AND the self-preference union); with
    # the loop AQE-off the per-round checkpoint compile is cheap enough
    # that per-round truncation wins (engine ladder: interval 5 = 54s
    # median, 2 = 42s AQE-on; interval 1 = 24.3s vs 2 = 29.0/33.7s
    # AQE-off on 100 supersteps)
    import os as _os
    _t_env = _os.environ.get("SPARK_GRAFT_TRUNC")
    truncate_every = int(_t_env) if _t_env else 1
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    info = ExecutionInfo()
    t0 = time.monotonic()

    e = G.symmetrize(edges) if not directed else edges
    e = e.select("src", "dst", "weight")
    # same byte diet as the superstep engine (SURVEY §7): the per-round
    # message join re-reads this cache, so int32 ids (and int32 LABELS —
    # labels ⊆ vertex ids) cut cached bytes/edge 24 → 16 when ids fit
    b = e.agg(
        F.max(F.greatest("src", "dst")).alias("mx"),
        F.min(F.least("src", "dst")).alias("mn"),
    ).first()
    use32 = b["mx"] is not None and b["mx"] < 2**31 and b["mn"] >= -(2**31)
    if use32:
        e = e.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
            "weight",
        )
    e = G.partition_edges(e, P).persist()
    # state ids ride int32 too so the round join is cast-free on BOTH
    # sides (a one-sided cast would re-exchange the edge cache every
    # round); widened back to long at return
    vid0 = F.col("id").cast("int").alias("id") if use32 else F.col("id")
    state = (
        G.vertices_from_edges(edges)
        .select(vid0)
        .select("id", F.col("id").alias("label"))
        .repartition(P, "id")
        .persist()
    )

    pending: list[DataFrame] = []
    for step in range(max_steps):
        ts = time.monotonic()
        msgs = state.hint("shuffle_hash").alias("s").join(
            e.alias("e"), F.col("s.id") == F.col("e.src")
        ).select(
            F.col("e.dst").alias("vid"), F.col("s.label").alias("label"), F.col("e.weight").alias("weight")
        )
        self_pref = state.select(
            F.col("id").alias("vid"), "label", F.lit(1.0).alias("weight")
        )
        scores = (
            msgs.unionAll(self_pref)
            .groupBy("vid", "label")
            .agg(F.sum("weight").alias("w"))
        )
        # argmax(w), tie -> min(label): one aggregate, no window sort
        picked = scores.groupBy("vid").agg(
            F.max(F.struct(F.col("w"), (-F.col("label")).alias("neg_label"))).alias("top")
        )
        new_state = picked.select(
            F.col("vid").alias("id"), (-F.col("top.neg_label")).alias("label")
        ).repartition(P, "id")
        if (step + 1) % truncate_every == 0:
            # checkpoint blocks ARE materialized storage — no extra
            # persist on top (the engine's no-double-store rule)
            new_state = new_state.localCheckpoint(eager=False)
        else:
            new_state = new_state.persist()

        if run_to_convergence:
            changed = (
                new_state.alias("n")
                .join(state.alias("o"), F.col("n.id") == F.col("o.id"))
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            state.unpersist()
        else:
            # fixed-round mode: rounds chain LAZILY — one materialization
            # for the whole run (below) instead of a count job per round;
            # old states stay registered until then
            pending.append(state)
            changed = -1
        state = new_state
        info.supersteps = step + 1
        info.per_step.append(
            {
                "superstep": step + 1,
                "changed": changed,
                "wall_ms": (time.monotonic() - ts) * 1000.0,
            }
        )
        if run_to_convergence and changed == 0:
            info.converged = True
            break

    if not run_to_convergence:
        # single materialization barrier for the lazily-chained rounds;
        # must happen BEFORE e.unpersist() below
        state.count()
        for df in pending:
            df.unpersist()
        pending.clear()
    e.unpersist()
    info.wall_seconds = time.monotonic() - t0
    info.caches.append(state)
    out = state.select(
        F.col("id").cast("long").alias("id"), F.col("label").cast("long").alias("label")
    )
    return out, info
