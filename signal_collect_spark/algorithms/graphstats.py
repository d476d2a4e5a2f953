"""Whole-graph structural statistics: degree assortativity, reciprocity.

Beyond-reference link-graph analytics on the same tier as the degree
and component summaries (the reference's aggregation surface covers
per-vertex state reductions, Graph.scala:66-90; these are the standard
EDGE-level structure summaries a web/citation/code graph audit reports
next to them):

- Degree assortativity (Newman, PRL 89 2002, eq. 4): the Pearson
  correlation of the degrees at the two ends of each undirected edge.
  Positive = hubs link to hubs (social graphs), negative = hubs link
  to leaves (the web, software imports). Computed over BOTH
  orientations of every undirected edge, which is the symmetric
  estimator Newman's formula defines.
- Reciprocity (classic dyad census ratio): the fraction of directed
  edges (u, v) whose reverse (v, u) is also present, on the simple
  directed graph without self-loops. The web's reciprocity is a
  standard crawl-quality signal (link farms reciprocate heavily).

Scale shape: both are a constant number of hash joins/aggregates over
the edge list — degree join keyed on the endpoint (hub keys are heavy;
AQE skew handling applies), then ONE scalar aggregate (`corr`, or a
conditional count via a self-equi-join on the reversed key). No
windows, no Python, no collect; output is a single row regardless of
graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One-row DataFrame[n_edges, assortativity] on the undirected
    simple graph (symmetrized, self-loops dropped).

    ``assortativity`` is Pearson's r over the (deg(u), deg(v)) pairs of
    every directed representation of each undirected edge, rounded to
    6 dp (the correlation is scale-invariant, so sample-vs-population
    normalization cancels and both engines compute the same r; the
    rounding absorbs parallel-sum reassociation). NULL (degenerate
    variance: regular graph) is surfaced as-is.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = adj.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("deg"))
    pairs = (
        adj.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("dx")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("dy")), "b")
    )
    return pairs.agg(
        (F.count("*") / 2).cast("long").alias("n_edges"),
        F.round(F.corr(F.col("dx").cast("double"), F.col("dy").cast("double")), 6).alias(
            "assortativity"
        ),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row DataFrame[n_edges, n_reciprocated, reciprocity] on the
    simple directed graph (distinct edges, self-loops dropped).

    ``reciprocity`` = |{(u,v) in E : (v,u) in E}| / |E| — both counts
    are exact longs, so the final division is bit-identical across
    engines.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(F.broadcast(recip.agg(F.count("*").alias("n_reciprocated"))))
        .select(
            "n_edges",
            "n_reciprocated",
            (F.col("n_reciprocated").cast("double") / F.col("n_edges")).alias(
                "reciprocity"
            ),
        )
    )
