"""Katz centrality through the delta-signaling engine.

Beyond-reference centrality completing the family around PageRank
(pagerank.py), HITS (hits.py), SALSA (salsa.py) and harmonic
(hyperball.py): Katz (Psychometrika 1953) counts ALL walks into a
vertex, attenuated by length —

    x(v) = beta + alpha * SUM_{(u,v) in E} w(u,v) * x(u)

i.e. PageRank's recurrence WITHOUT the out-degree normalization, so
mass is amplified by fan-out rather than split over it (converges for
alpha < 1/lambda_max of the weighted adjacency; the caller picks
alpha, conventionally well under 1/max_outdegree-ish bounds).

Implementation is the same delta formulation the engine runs PageRank
with (algorithms/pagerank.py, reference EfficientPageRank.scala:34-63):
state0 = delta0 = beta; a frontier vertex emits its pending delta *
RAW edge weight (``weight_col="weight"`` — the one-line semantic
difference from PageRank's ``norm_weight``); collect does
x += alpha * inbox. Identical plan shape, cost, gating, checkpointing
and int32 byte-diet behavior as every other kernel — this module is
evidence the Kernel surface (superstep.py, SURVEY §2.5) expresses new
spectral algorithms by changing only the algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps


def katz_kernel(alpha: float, beta: float) -> Kernel:
    def init(vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id",
            F.lit(beta).alias("katz"),
            F.lit(beta).alias("delta"),
            F.lit(abs(beta)).alias("residual"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        inbox = F.coalesce(F.col("inbox"), F.lit(0.0))
        kept = F.when(F.col("was_frontier"), F.lit(0.0)).otherwise(F.col("delta"))
        new_delta = kept + F.lit(alpha) * inbox
        return joined.select(
            "id",
            (F.col("katz") + F.lit(alpha) * inbox).alias("katz"),
            new_delta.alias("delta"),
            F.abs(new_delta).alias("residual"),
        )

    return Kernel(
        name="katz",
        init=init,
        value=lambda: F.col("delta"),
        edge_combine="mul",
        agg="sum",
        collect=collect,
        weight_col="weight",
        state_cols=["katz", "delta", "residual"],
    )


def katz(
    spark,
    edges: DataFrame,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    converge_tol: float = 1e-9,
    max_steps: int = 100,
    num_partitions: int | str | None = "auto",
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Run Katz centrality; returns (DF[id, katz], info).

    Divergence guard: alpha * max(weighted in-degree) >= 1 guarantees a
    non-contracting iteration on some vertex, so the engine would churn
    to max_steps with growing residuals — raise early with the measured
    bound instead (the true radius is 1/lambda_max, which this bound
    under-approximates conservatively; passing the check does not PROVE
    convergence, failing it proves divergence).
    """
    norm = G.normalize_edges(edges)
    wdeg = (
        norm.groupBy("dst").agg(F.sum("weight").alias("wd")).agg(F.max("wd")).first()[0]
    )
    if wdeg is not None and alpha * float(wdeg) >= 1.0 and converge_tol > 0.0:
        raise ValueError(
            f"katz: alpha={alpha} x max weighted in-degree {wdeg} >= 1 — "
            "iteration cannot contract; lower alpha (needs alpha < 1/lambda_max)"
        )
    vertices = G.vertices_from_edges(edges)
    state, info = run_supersteps(
        spark,
        norm,
        vertices,
        katz_kernel(alpha, beta),
        signal_threshold=0.0,
        converge_tol=converge_tol,
        max_steps=max_steps,
        num_partitions=num_partitions,
        **engine_opts,
    )
    # 4-dp rounding absorbs parallel-sum float reassociation. Katz
    # AMPLIFIES mass (no out-degree split), so after max_steps
    # unnormalized gather-sums the cross-engine noise is ~1e-13 —
    # a 6-dp grid was measured to straddle a .5e-6 boundary on 1 of
    # 4449 vertices at sf0.01; 4 dp puts the boundary-hit probability
    # below 1e-8 per row while keeping 4+ significant decimals on
    # O(1) centrality values.
    return state.select("id", F.round("katz", 4).alias("katz")), info
