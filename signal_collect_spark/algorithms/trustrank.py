"""TrustRank and spam-mass estimation on the link graph.

TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB'04) is PageRank with
the teleport vector concentrated on a hand-verified trusted seed set;
spam mass (Gyöngyi et al., "Link Spam Detection Based on Mass
Estimation", VLDB'06) measures how much of a page's PageRank arrives
through non-trusted paths.  Both are pure compositions of the engine's
personalized PageRank (reference semantics: examples/PageRank.scala:39,57
— r(v) = 0.15·p(v) + 0.85·Σ_in r(u)·w/Σw(u), unnormalized teleport,
no dangling redistribution), so this module adds no new kernel: it runs
the delta-formulation superstep engine twice and joins.

Unnormalized-basis note.  The reference's uniform base is p(v)=1 for
every vertex (total teleport mass n); the trusted run uses p(v)=1 on
seeds only (total mass |S|).  PageRank is linear in the teleport
vector, so the normalized quantities of the papers are pr/n and tr/|S|,
and the *relative spam mass* becomes

    m(v) = (pr/n − tr/|S|) / (pr/n)  =  1 − (n/|S|) · tr(v)/pr(v)

pr(v) ≥ 0.15 > 0 always (uniform base), so the division is total.
m ≈ 0 → rank fully explained by trusted flow; m → 1 → no trusted path
(link-spam suspect).  m can be negative when a vertex receives *more*
than its uniform share through trusted paths (seed neighbourhoods).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.pagerank import pagerank
from signal_collect_spark.superstep import ExecutionInfo


def trustrank(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_steps: int = 200,
    converge_tol: float = 1e-9,
    num_partitions: int | str | None = "auto",
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo, ExecutionInfo]:
    """Returns (DF[id, trust, spam_mass], trust_info, pr_info).

    ``seeds``: DF[id] — the trusted set S.  ``trust`` is the
    seed-personalized PageRank (teleport 0.15 on S, 0 elsewhere);
    ``spam_mass`` the relative mass 1 − (n/|S|)·trust/pr.  Both runs
    share the same edge normalization and engine configuration, so the
    two score vectors are on the reference's exact trajectory.
    """
    seed_ids = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct()
    pers = seed_ids.select("id", F.lit(1.0).alias("p"))

    tr, tr_info = pagerank(
        spark, edges, personalization=pers, max_steps=max_steps,
        converge_tol=converge_tol, num_partitions=num_partitions, **engine_opts,
    )
    pr, pr_info = pagerank(
        spark, edges, max_steps=max_steps,
        converge_tol=converge_tol, num_partitions=num_partitions, **engine_opts,
    )

    # n and |S| are two tiny aggregates; |S| counts only seeds that are
    # actually vertices of the graph (a seed absent from the edge table
    # contributes no teleport mass in either basis).
    verts = pr.select("id")
    n = verts.count()
    n_seeds = seed_ids.join(verts, "id", "left_semi").count()
    if n_seeds == 0:
        raise ValueError("trustrank: no seed id occurs in the graph")

    scale = float(n) / float(n_seeds)
    out = (
        pr.withColumnRenamed("rank", "pr")
        .join(tr.withColumnRenamed("rank", "trust"), "id")
        .select(
            "id",
            "trust",
            (F.lit(1.0) - F.lit(scale) * F.col("trust") / F.col("pr")).alias(
                "spam_mass"
            ),
        )
    )
    return out, tr_info, pr_info
