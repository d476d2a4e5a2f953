"""Semi-supervised label spreading with clamped seeds.

The numeric companion to Chinese-Whispers label propagation
(reference ChineseWhispersClustering.scala:24-47, implemented in
labelprop.py): instead of a hard argmax label, every vertex carries a
class score p ∈ [0, 1]; labeled seed vertices stay CLAMPED to their
given label, and every unlabeled vertex repeatedly takes the
weighted mean of its in-neighbours' scores (Zhou et al., NIPS'03
"Learning with local and global consistency", with the clamping set
to hard α=1 on seeds — the standard web-scale variant, e.g. YouTube
video-label adsorption).

Engine mapping: signal = p·w per out-edge (the PageRank edge form,
examples/PageRank.scala:39), inbox = Σ p·w; the static denominator
Σ_in w rides in vertex state from init, so collect is
  p' = seed ? p : Σ p·w / Σ w          (keep p when no in-edges)
Every vertex signals every round (residual pinned 1) for a fixed
round count — the unrolled-iteration semantics the oracle replays.

Scale: the per-round cost IS the engine's signal join (shuffle-hash,
map-side combined, int32-dieted); the in-weight denominator is one
extra aggregate at init, reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps


def label_spreading(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    steps: int = 10,
    default_p: float = 0.5,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """``seeds``: DF[id, label] with label in {0, 1}.  Returns
    (DF[id, p, label], info): p the spread class score after ``steps``
    rounds, label = 1 iff p > 0.5 (seeds keep their clamp exactly)."""
    seed_df = seeds.select(
        F.col(seeds.columns[0]).alias("id"),
        F.col(seeds.columns[1]).cast("double").alias("__lbl"),
    )
    inw = edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum("weight").alias("__inw")
    )

    def init(vertices: DataFrame) -> DataFrame:
        return (
            vertices.join(seed_df, "id", "left")
            .join(inw, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("__lbl"), F.lit(default_p)).alias("p"),
                F.col("__lbl").isNotNull().cast("double").alias("seed"),
                F.coalesce(F.col("__inw"), F.lit(0.0)).alias("inw"),
                F.lit(1.0).alias("residual"),
            )
        )

    def collect(joined: DataFrame) -> DataFrame:
        spread = F.when(
            (F.col("seed") == 0.0) & (F.col("inw") > 0.0) & F.col("inbox").isNotNull(),
            F.col("inbox") / F.col("inw"),
        ).otherwise(F.col("p"))
        return joined.select(
            "id",
            spread.alias("p"),
            "seed",
            "inw",
            F.lit(1.0).alias("residual"),
        )

    kernel = Kernel(
        name="label_spreading",
        init=init,
        value=lambda: F.col("p"),
        edge_combine="mul",
        agg="sum",
        collect=collect,
        state_cols=["p", "seed", "inw", "residual"],
    )
    vertices = G.vertices_from_edges(edges)
    state, info = run_supersteps(
        spark, edges, vertices, kernel,
        signal_threshold=0.0, converge_tol=-1.0, max_steps=steps,
        **engine_opts,
    )
    out = state.select(
        "id", "p", (F.col("p") > 0.5).cast("int").alias("label")
    )
    return out, info
