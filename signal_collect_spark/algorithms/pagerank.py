"""PageRank with Signal/Collect's exact semantics.

Reference formulation (examples/PageRank.scala:31-70):
    state₀ = 1 − d = 0.15 (d = 0.85, :49)
    collect  = 0.15 + 0.85 · Σ (most recent signal per in-edge)   (:57)
    signal   = state · weight / sumOfOutWeights                    (:39)
    scoreSignal = |state − lastSignalState|                        (:59-68)
UNNORMALIZED: a cycle converges to 1.0 per vertex; dangling vertices
(no out-edges) never signal and their mass is NOT redistributed
(AbstractVertex.scala:117-119 iterates an empty edge map) — we preserve
this exactly; no textbook dangling-mass term.

Execution uses the algebraically-identical delta formulation
(examples/EfficientPageRank.scala:34-63):
    state₀ = 0.15; collect-on-delivery state += 0.85·signal (:51-53)
    signal = (state − lastSignalState) · weight/Σw               (:43-49)
    scoreSignal = state − lastSignalState                        (:55-57)
so only changed vertices emit (delta-based signaling / score-guided
scheduling) — at the fixpoint both formulations satisfy
r(v) = 0.15 + 0.85 · Σ_in r(u)·w/Σw(u). tests verify the engine output
against a literal-formula numpy oracle to 1e-6 (the reference's own
Verifier.scala:31-69 differential-test pattern).

Kernel state: (id, rank, delta, residual); residual = |delta| ≙
scoreSignal. A vertex that signalled resets its delta (lastSignalState
:= state after the signal op, AbstractVertex.scala); a sub-threshold
vertex keeps accumulating delta until it crosses the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps

DAMPING = 0.85
BASE = 0.15


def pagerank_kernel(signal_threshold: float, personalization: DataFrame | None = None) -> Kernel:
    """``personalization``: optional (id, p) — the teleport vector.
    r(v) = 0.15·p(v) + 0.85·Σ_in r(u)·w/Σw(u); p defaults to 1 for all
    vertices (the reference's uniform unnormalized base). Same delta
    trajectory, just a per-vertex r₀ = 0.15·p."""

    def init(vertices: DataFrame) -> DataFrame:
        if personalization is not None:
            base = vertices.join(personalization, "id", "left").select(
                "id",
                (F.lit(BASE) * F.coalesce(F.col("p"), F.lit(0.0))).alias("r0"),
            )
        else:
            base = vertices.select("id", F.lit(BASE).alias("r0"))
        return base.select(
            "id",
            F.col("r0").alias("rank"),
            F.col("r0").alias("delta"),
            F.abs(F.col("r0")).alias("residual"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        inbox = F.coalesce(F.col("inbox"), F.lit(0.0))
        # a frontier vertex emitted its pending delta this superstep
        kept = F.when(F.col("was_frontier"), F.lit(0.0)).otherwise(F.col("delta"))
        new_delta = kept + F.lit(DAMPING) * inbox
        return joined.select(
            "id",
            (F.col("rank") + F.lit(DAMPING) * inbox).alias("rank"),
            new_delta.alias("delta"),
            F.abs(new_delta).alias("residual"),
        )

    return Kernel(
        name="pagerank",
        init=init,
        value=lambda: F.col("delta"),
        edge_combine="mul",
        agg="sum",
        collect=collect,
        weight_col="norm_weight",
        state_cols=["rank", "delta", "residual"],
    )


def pagerank(
    spark,
    edges: DataFrame,
    *,
    signal_threshold: float = 0.0,
    converge_tol: float = 1e-9,
    max_steps: int = 200,
    mode: str = "sql",
    num_partitions: int | str | None = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    personalization: DataFrame | None = None,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Run PageRank; returns (DF[id, rank], info).

    ``max_steps`` bounds supersteps (≙ ExecutionConfiguration stepsLimit);
    with ``signal_threshold=0`` and ``max_steps=1`` this reproduces the
    exact-one-superstep semantics of ComputationTerminationSpec.scala:79-97.
    ``personalization`` (id, p) biases the teleport base to 0.15·p —
    personalized PageRank with the same delta engine.
    """
    norm = G.normalize_edges(edges)
    vertices = G.vertices_from_edges(edges)
    state, info = run_supersteps(
        spark,
        norm,
        vertices,
        pagerank_kernel(signal_threshold, personalization),
        signal_threshold=signal_threshold,
        converge_tol=converge_tol,
        max_steps=max_steps,
        mode=mode,
        num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        **engine_opts,
    )
    return state.select("id", "rank"), info
