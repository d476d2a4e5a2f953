"""Redirect-chain resolution by pointer doubling.

Beyond-reference web-ingest operator. A crawl frontier at web scale
carries HTTP 301/308 and rel=canonical redirects — a FUNCTIONAL graph
(every source has at most one out-pointer). Before building the link
graph, each redirecting URL must be resolved to its final target
(otherwise PageRank mass splits across chain aliases, the same failure
the reference's raw-string WebCrawler has — examples/WebCrawler.scala:
29-67, see also data/web.py's canonicalization layer).

Naive per-hop following needs O(max chain length) rounds; this
implements POINTER DOUBLING (pointer jumping — the classic PRAM
list-ranking technique, the same round-compression idea as the star
connected components in components.py): each round every unresolved
pointer jumps to its pointer's pointer, so after k rounds a pointer
has advanced 2^k hops. A 10^6-long chain resolves in 20 rounds, each
round ONE hash self-join (f.p == f.v) plus the engine-wide
persist/localCheckpoint discipline.

Cycle handling is EXACT, no fingerprints: resolved(v) ⟺ f(v) is a
non-source (the self-join misses). Chains have nodes at every depth
1..L, so while any chain node is unresolved the unresolved count
strictly decreases every round; a round with an UNCHANGED nonzero
count therefore proves every remaining node lies on (or feeds into)
a redirect cycle — those are returned with ``final = NULL,
is_cycle = true`` instead of looping forever.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.superstep import ExecutionInfo


def resolve_redirects(
    spark,
    redirects: DataFrame,
    *,
    max_rounds: int = 48,
    num_partitions: int | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Resolve every redirect source to its final (non-redirecting)
    target.

    Parameters
    ----------
    redirects : DataFrame[src, dst]
        One redirect pointer per row. If a source appears more than
        once, the minimum dst is kept (deterministic; a crawl log can
        legitimately record several observations). Self-redirects are
        treated as cycles of length 1.
    max_rounds : hard cap on doubling rounds (48 covers chains up to
        2^48 hops — unreachable in practice; the loop exits earlier via
        the exact cycle/stall detection above).

    Returns (DataFrame[src, final, hops, is_cycle], info): one row per
    DISTINCT redirect source; ``final``/``hops`` are NULL exactly when
    ``is_cycle`` (the source loops or feeds into a loop). Targets that
    never redirect are not rows — they are already final.
    """
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    f = (
        redirects.select("src", "dst")
        .groupBy(F.col("src").alias("v"))
        .agg(F.min("dst").alias("p"))
        .withColumn("d", F.lit(1).cast("long"))
        .repartition(P, "v")
        .persist()
    )
    info = ExecutionInfo()
    t0 = _time.monotonic()
    # unresolved(v) ⟺ p(v) is itself a redirect source. A self-redirect
    # (v == p) is unresolved by construction and caught by the stall.
    prev_unresolved = None
    pending = [f]

    for rnd in range(1, max_rounds + 1):
        hop = f.select(
            F.col("v").alias("p2"), F.col("p").alias("pp"), F.col("d").alias("d2")
        )
        nxt = (
            f.join(hop, f["p"] == hop["p2"], "left")
            .select(
                "v",
                F.coalesce("pp", "p").alias("p"),
                (F.col("d") + F.coalesce("d2", F.lit(0))).alias("d"),
                F.col("pp").isNotNull().alias("__hit"),
            )
        )
        nxt = nxt.repartition(P, "v").localCheckpoint(eager=False).persist()
        unresolved = nxt.filter("__hit").count()
        pending.append(nxt)
        f = nxt.drop("__hit")
        info.supersteps = rnd
        info.per_step.append({"round": rnd, "unresolved": unresolved})
        if unresolved == 0 or unresolved == prev_unresolved:
            # 0 → every chain resolved; stall → remainder are cycles
            info.converged = True
            info.stop_reason = "converged"
            break
        prev_unresolved = unresolved

    # a source is cycle-bound iff its pointer is STILL a source
    # (exact set test, not the per-round __hit flag, so the result is
    # right even if max_rounds cut the loop early mid-chain)
    srcs = f.select(F.col("v").alias("p")).distinct()
    out = (
        f.join(srcs, "p", "left_semi")
        .select("v", F.lit(True).alias("is_cycle"))
        .join(f, "v", "right")
        .select(
            F.col("v").alias("src"),
            F.when(F.col("is_cycle").isNull(), F.col("p")).alias("final"),
            F.when(F.col("is_cycle").isNull(), F.col("d")).alias("hops"),
            F.coalesce("is_cycle", F.lit(False)).alias("is_cycle"),
        )
        .localCheckpoint(eager=True)
    )
    for df in pending:
        df.unpersist()
    info.wall_seconds = _time.monotonic() - t0
    return out, info
