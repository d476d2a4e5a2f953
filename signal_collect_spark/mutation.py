"""Graph mutation semantics re-expressed as DataFrame set operations.

The reference mutates a live actor-hosted graph (GraphEditor.scala:37-170,
applied in WorkerImplementation.scala:299-386). In a batch engine the
graph is an immutable DataFrame; "mutation" = producing the next edge/
vertex table version — which is also exactly how an Iceberg table
evolves (snapshot per commit). Handler semantics preserved:

  * duplicate addVertex → ExistingVertexHandler, default KEEP EXISTING
    (interfaces/Handlers.scala:26-37; verified by
    features/MultipleVertexAdditionsSpec.scala:51-73)
  * addEdge to missing vertex → EdgeAddedToNonExistentVertexHandler;
    default raises, common override auto-creates
    (interfaces/Handlers.scala:52-63)
  * undeliverable signal → default raises; batch equivalent: inner
    join drops, ``undeliverable_signals`` audits
    (interfaces/Handlers.scala:39-50)
  * removeVertex/removeEdge (WorkerImplementation.scala:343-377) →
    anti-joins
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_vertices(
    existing: DataFrame, new: DataFrame, on_duplicate: str = "keep_existing"
) -> DataFrame:
    """Union vertex tables (id, state…) with duplicate-id handling.

    on_duplicate: "keep_existing" (reference default), "keep_new",
    or "fail" (raises if any id collides).
    """
    if on_duplicate == "fail":
        dup = new.join(existing, "id", "left_semi")
        n = dup.count()
        if n:
            raise ValueError(f"{n} duplicate vertex ids (handler=fail)")
        return existing.unionByName(new)
    if on_duplicate == "keep_existing":
        return existing.unionByName(new.join(existing, "id", "left_anti"))
    if on_duplicate == "keep_new":
        return new.unionByName(existing.join(new, "id", "left_anti"))
    raise ValueError(f"unknown on_duplicate {on_duplicate!r}")


def add_edges(
    vertices: DataFrame,
    edges: DataFrame,
    new_edges: DataFrame,
    on_missing_vertex: str = "create",
) -> tuple[DataFrame, DataFrame]:
    """Append edges; returns (vertices', edges').

    on_missing_vertex: "create" (auto-create endpoints — the common
    handler override), "drop" (edges to unknown vertices vanish),
    "fail" (reference default)."""
    endpoints = (
        new_edges.select(F.col("src").alias("id"))
        .unionAll(new_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    missing = endpoints.join(vertices.select("id"), "id", "left_anti")
    if on_missing_vertex == "fail":
        n = missing.count()
        if n:
            raise ValueError(f"{n} edge endpoints reference missing vertices")
        kept = new_edges
        verts = vertices
    elif on_missing_vertex == "drop":
        ok = vertices.select("id")
        kept = (
            new_edges.join(ok.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ok.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select(*new_edges.columns)
        )
        verts = vertices
    elif on_missing_vertex == "create":
        kept = new_edges
        extra_cols = [c for c in vertices.columns if c != "id"]
        created = missing.select("id", *[F.lit(None).alias(c) for c in extra_cols])
        verts = vertices.unionByName(created)
    else:
        raise ValueError(f"unknown on_missing_vertex {on_missing_vertex!r}")
    return verts, edges.unionByName(kept)


def remove_vertices(vertices: DataFrame, edges: DataFrame, ids: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Drop vertices and every incident edge (≙ removeVertex +
    removeAllEdges, WorkerImplementation.scala:343-377). ``ids`` is a
    one-column (id) DataFrame — at scale never a driver-side list."""
    v = vertices.join(ids, "id", "left_anti")
    e = (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
    )
    return v, e


def remove_edges(edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """Drop edges by (src, dst) pairs — anti join."""
    return edges.join(pairs.select("src", "dst"), ["src", "dst"], "left_anti")


def undeliverable_signals(signals: DataFrame, vertices: DataFrame) -> DataFrame:
    """Audit: signals addressed to nonexistent targets (the rows the
    engine's inner join silently drops) ≙ UndeliverableSignalHandler."""
    return signals.join(
        vertices.select(F.col("id").alias("dst")), "dst", "left_anti"
    )


def reset(edges_source: DataFrame) -> DataFrame:
    """≙ Graph.reset (Graph.scala:194): rebuild pristine graph state
    from the source edge table — in batch, simply re-derive."""
    return edges_source
