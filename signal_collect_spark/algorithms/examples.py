"""The remaining reference example algorithms, each a thin Kernel over
the generic superstep engine — demonstrating the engine reproduces the
full signal/collect example library (SURVEY.md §2.2), not just the
link-graph four.

  * company_valuation — weighted-sum fixpoint (generalized PageRank):
    collect = coreValue + Σ signals; signal = state·percentage
    (examples/CompanyValuation.scala:25-33)
  * game_of_life — fixed-iteration rule on Σ of neighbour states
    (examples/GameOfLife.scala:34-47)
  * schelling_segregation — flip type when the fraction of same-type
    neighbours < threshold (examples/SchellingSegregation.scala:31-45)
  * vertex_coloring — conflict-driven recolouring; the reference picks
    a RANDOM free colour (examples/VertexColoring.scala:63-86) which is
    non-deterministic — we pin a seeded deterministic choice
    (xxhash64(id, superstep) % max_colors) so runs are reproducible;
    the verified property is the reference's own test property: no two
    adjacent vertices share a colour (IntegrationSpec.scala:166-194).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.superstep import ExecutionInfo, Kernel, run_supersteps


def company_valuation(
    spark,
    ownership_edges: DataFrame,
    core_values: DataFrame,
    *,
    converge_tol: float = 1e-9,
    max_steps: int = 200,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """ownership_edges: (src, dst, weight=ownership fraction of dst held
    in src... direction follows the reference: signal flows src→dst
    carrying state·weight). core_values: (id, core_value).
    Returns (id, valuation) with valuation = core + Σ_in val(u)·w —
    delta-formulated exactly like delta-PageRank (same monoid)."""

    def init(vertices: DataFrame) -> DataFrame:
        v = vertices.join(core_values, "id", "left").select(
            "id", F.coalesce(F.col("core_value"), F.lit(0.0)).alias("core_value")
        )
        return v.select(
            "id",
            F.col("core_value").alias("valuation"),
            F.col("core_value").alias("delta"),
            F.abs(F.col("core_value")).alias("residual"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        inbox = F.coalesce(F.col("inbox"), F.lit(0.0))
        kept = F.when(F.col("was_frontier"), F.lit(0.0)).otherwise(F.col("delta"))
        nd = kept + inbox
        return joined.select(
            "id",
            (F.col("valuation") + inbox).alias("valuation"),
            nd.alias("delta"),
            F.abs(nd).alias("residual"),
        )

    kernel = Kernel(
        name="company_valuation",
        init=init,
        value=lambda: F.col("delta"),
        edge_combine="mul",
        agg="sum",
        collect=collect,
        weight_col="weight",
    )
    vertices = G.vertices_from_edges(ownership_edges)
    state, info = run_supersteps(
        spark, ownership_edges, vertices, kernel,
        converge_tol=converge_tol, max_steps=max_steps, **engine_opts,
    )
    return state.select("id", "valuation"), info


def game_of_life(
    spark,
    neighbor_edges: DataFrame,
    alive_ids: DataFrame,
    *,
    steps: int,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Conway rule on an arbitrary neighbour graph for exactly ``steps``
    generations. alive_ids: (id) initially-alive set. Full re-emission
    every step (DataGraphVertex latest-signal semantics need every
    neighbour's current state)."""

    def init(vertices: DataFrame) -> DataFrame:
        alive = alive_ids.select("id").withColumn("alive", F.lit(1.0))
        return vertices.join(alive, "id", "left").select(
            "id",
            F.coalesce(F.col("alive"), F.lit(0.0)).alias("state"),
            F.lit(1.0).alias("residual"),  # everyone signals every step
        )

    def collect(joined: DataFrame) -> DataFrame:
        n = F.coalesce(F.col("inbox"), F.lit(0.0))
        new = F.when(
            (n == 3) | ((F.col("state") == 1.0) & (n == 2)), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        return joined.select("id", new.alias("state"), F.lit(1.0).alias("residual"))

    kernel = Kernel(
        name="game_of_life",
        init=init,
        value=lambda: F.col("state"),
        edge_combine="value",
        agg="sum",
        collect=collect,
    )
    vertices = G.vertices_from_edges(neighbor_edges)
    state, info = run_supersteps(
        spark, neighbor_edges, vertices, kernel,
        converge_tol=-1.0, max_steps=steps, **engine_opts,
    )
    return state.select("id", F.col("state").cast("int").alias("alive")), info


def schelling_segregation(
    spark,
    neighbor_edges: DataFrame,
    types: DataFrame,
    *,
    threshold: float = 0.4,
    steps: int = 20,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """types: (id, type 0/1). Each round an agent flips its type when
    the fraction of same-type neighbours < threshold (the reference
    flips state rather than relocating, SchellingSegregation.scala:31-45).
    Needs two inbox views: Σ neighbour types and neighbour count."""

    def init(vertices: DataFrame) -> DataFrame:
        return vertices.join(types, "id", "left").select(
            "id",
            F.coalesce(F.col("type"), F.lit(0)).cast("double").alias("state"),
            F.lit(1.0).alias("residual"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        ones = F.coalesce(F.col("type_sum"), F.lit(0.0))
        n = F.coalesce(F.col("n_nbrs"), F.lit(0)).cast("double")
        same = F.when(F.col("state") == 1.0, ones).otherwise(n - ones)
        frac = F.when(n > 0, same / n).otherwise(F.lit(1.0))
        new = F.when(frac < F.lit(threshold), 1.0 - F.col("state")).otherwise(
            F.col("state")
        )
        return joined.select("id", new.alias("state"), F.lit(1.0).alias("residual"))

    kernel = Kernel(
        name="schelling",
        init=init,
        value=lambda: F.col("state"),
        edge_combine="value",
        agg=[("type_sum", "sum"), ("n_nbrs", "count")],
        collect=collect,
    )
    vertices = G.vertices_from_edges(neighbor_edges)
    state, info = run_supersteps(
        spark, neighbor_edges, vertices, kernel,
        converge_tol=-1.0, max_steps=steps, **engine_opts,
    )
    return state.select("id", F.col("state").cast("int").alias("type")), info


def vertex_coloring(
    spark,
    neighbor_edges: DataFrame,
    max_colors: int,
    *,
    max_steps: int = 50,
    seed: int = 42,
    **engine_opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Deterministic-seeded conflict-driven colouring on the undirected
    graph, mirroring the reference's collect (a conflicted vertex picks
    a free colour not among heard neighbour colours,
    VertexColoring.scala:63-86) with the random choice replaced by
    xxhash64(id, step, seed) — reproducible runs. Property on success:
    no two adjacent vertices share a colour (the reference's own test
    property, IntegrationSpec.scala:166-194).

    Delta semantics make conflicts eventually visible: whichever vertex
    CHANGED into a clash has emitted, so the other endpoint hears the
    clash and moves off it — every real conflict is heard by at least
    one side within a superstep."""

    def init(vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id",
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(max_colors))
            .cast("double")
            .alias("state"),
            F.lit(1.0).alias("residual"),
            F.lit(0).alias("step"),
        )

    def collect(joined: DataFrame) -> DataFrame:
        nbr_colors = F.coalesce(F.col("inbox"), F.expr("array()").cast("array<double>"))
        conflict = F.array_contains(nbr_colors, F.col("state"))
        all_colors = F.transform(
            F.sequence(F.lit(0), F.lit(max_colors - 1)),
            lambda i: i.cast("double"),
        )
        free = F.filter(all_colors, lambda c: ~F.array_contains(nbr_colors, c))
        pick_idx = (
            F.pmod(
                F.xxhash64("id", F.col("step") + 1, F.lit(seed)), F.size(free)
            ).cast("int")
            + 1
        )
        new_color = F.when(
            conflict & (F.size(free) > 0), F.element_at(free, pick_idx)
        ).otherwise(F.col("state"))
        return joined.select(
            "id",
            new_color.alias("state"),
            F.when(conflict, F.lit(1.0)).otherwise(F.lit(0.0)).alias("residual"),
            (F.col("step") + 1).alias("step"),
        )

    kernel = Kernel(
        name="vertex_coloring",
        init=init,
        value=lambda: F.col("state"),
        edge_combine="value",
        agg="set",
        collect=collect,
    )
    und = G.symmetrize(neighbor_edges)
    vertices = G.vertices_from_edges(neighbor_edges)
    state, info = run_supersteps(
        spark, und, vertices, kernel,
        converge_tol=0.0, max_steps=max_steps, **engine_opts,
    )
    return state.select("id", F.col("state").cast("int").alias("color")), info
