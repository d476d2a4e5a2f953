"""Path/regex queries over the edge table — bounded-round frontier joins.

Reference semantics (examples/PathQuery.scala:29-160): a PathQuery is a
chain of query nodes (FixedQueryNode — matches one vertex id;
WildcardQueryNode — matches any vertex; StarQueryNode — a wildcard that
may match up to maxExpansion vertices in a row). Partial queries travel
along edges as signals carrying (matchedPath, unmatchedQuery); a vertex
matching the head consumes it and forwards the remainder to its
out-neighbours (QueryVertex.collect, PathQuery.scala:126-160); an empty
remainder emits the matched path (ResultHandler).

Spark-native re-expression: the partial-query population IS a frontier
DataFrame (id, pos, star_rem, path) — id = vertex being matched this
round, pos = index of the head query node, star_rem = remaining repeat
budget when the head is a star, path = vertex ids matched so far. One
round = one co-located join with the edge table; every column operation
(head match, path append, star bookkeeping) is a Catalyst expression —
no Python in the loop. Rounds are bounded by the query's maximum
expansion length (Σ star budgets + #nodes), so the loop is inherently
terminating — paths are WALKS (vertices may repeat), exactly like the
reference, which never dedups.

Star semantics pinned (the reference's comment says "0 to maxExpansion"
but its implementation requires ≥1 match once the star is the head —
PathQuery.scala:44-53): here a star matches 1..max_expansion
consecutive vertices. Documented deviation: FIXTURES.md §C style.

Scale: each round shuffles only live partial queries (frontier),
hash-joined against the edge table partitioned by src; the result is
collected per round only into a lazily-unioned DataFrame, never the
driver. Path state rides as an array<long> column (bounded by the
query length, so row width is bounded).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G


@dataclass(frozen=True)
class QueryNode:
    """One element of a path query.

    kind: 'fixed' (matches only vertex ``vertex_id``), 'wildcard'
    (matches any vertex), 'star' (wildcard matching 1..max_expansion
    consecutive vertices).
    """

    kind: str
    vertex_id: int | None = None
    max_expansion: int = 1


def fixed(vertex_id: int) -> QueryNode:
    return QueryNode("fixed", vertex_id=vertex_id)


def wildcard() -> QueryNode:
    return QueryNode("wildcard")


def star(max_expansion: int) -> QueryNode:
    return QueryNode("star", max_expansion=max_expansion)


def _match_pred(node: QueryNode):
    if node.kind == "fixed":
        return F.col("id") == F.lit(node.vertex_id)
    if node.kind in ("wildcard", "star"):
        return F.lit(True)
    raise ValueError(f"unknown query node kind {node.kind!r}")


def path_query(
    spark,
    edges: DataFrame,
    query: list[QueryNode],
    start_ids: list[int] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """All walks matching ``query``: DataFrame (path: array<long>).

    A path starts at any vertex matching query[0] (optionally
    restricted to ``start_ids``) and follows directed edges; node i of
    the walk must match query node i (stars may absorb several walk
    nodes). Deterministic: result is distinct paths.
    """
    if not query:
        raise ValueError("empty query")
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_p = G.partition_edges(edges.select("src", "dst"), P).persist()
    verts = G.vertices_from_edges(edges)
    if start_ids is not None:
        verts = verts.filter(F.col("id").isin([int(s) for s in start_ids]))

    n = len(query)
    max_rounds = sum(q.max_expansion if q.kind == "star" else 1 for q in query)

    # head-match predicate as a CASE over pos (query is small + static)
    pred = F.lit(False)
    for i, qn in enumerate(query):
        pred = F.when(F.col("pos") == i, _match_pred(qn)).otherwise(pred)

    # star_rem = additional stays allowed AFTER the current match;
    # statically known for the initial head
    init_star = query[0].max_expansion - 1 if query[0].kind == "star" else 0
    empty_path = F.expr("array()").cast("array<long>")
    frontier = verts.select(
        "id",
        F.lit(0).alias("pos"),
        F.lit(init_star).alias("star_rem"),
        empty_path.alias("path"),
    )

    results: DataFrame | None = None
    cached: list[DataFrame] = []
    for _round in range(max_rounds):
        matched = frontier.filter(pred).select(
            "id", "pos", "star_rem", F.concat("path", F.array(F.col("id"))).alias("path")
        ).persist()
        cached.append(matched)
        if matched.isEmpty():
            break

        # finished: the consumed head was the last query node
        done = matched.filter(F.col("pos") + 1 >= n).select("path")
        results = done if results is None else results.unionAll(done)

        # continuations: consume the head (advance pos, reset star budget
        # for the NEW head) or stay on a star with remaining budget
        consume = matched.filter(F.col("pos") + 1 < n).select(
            "id", (F.col("pos") + 1).alias("pos"), "path"
        )
        nxt_budget = F.lit(0)
        for i, qn in enumerate(query):
            if qn.kind == "star":
                nxt_budget = F.when(F.col("pos") == i, F.lit(qn.max_expansion - 1)).otherwise(nxt_budget)
        consume = consume.select("id", "pos", nxt_budget.alias("star_rem"), "path")
        stay = matched.filter(F.col("star_rem") > 0).select(
            "id", "pos", (F.col("star_rem") - 1).alias("star_rem"), "path"
        )
        live = consume.unionAll(stay)
        frontier = (
            live.hint("shuffle_hash").alias("f")
            .join(edges_p.alias("e"), F.col("f.id") == F.col("e.src"))
            .select(F.col("e.dst").alias("id"), "f.pos", "f.star_rem", "f.path")
        )

    if results is None:
        out = spark.createDataFrame([], "path array<bigint>")
    else:
        # materialize before releasing the per-round caches the union
        # still references (bounded size: matched paths only)
        out = results.distinct().localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    edges_p.unpersist()
    return out


def path_query_strings(spark, edges, query, **kw) -> DataFrame:
    """Same as :func:`path_query` but paths rendered 'a-b-c' — the
    cross-engine-comparable form used by the driver oracle."""
    paths = path_query(spark, edges, query, **kw)
    return paths.select(
        F.array_join(F.transform("path", lambda x: x.cast("string")), "-").alias("path")
    ).distinct()
