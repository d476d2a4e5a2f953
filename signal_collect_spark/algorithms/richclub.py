"""Rich-club coefficient curve φ(k) for the whole degree range at once.

φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k = vertices of degree > k and
E_k = undirected edges between two such vertices (Zhou & Mondragón,
IEEE Comm. Lett. 2004) — the standard "do the hubs form an elite
clique?" diagnostic for web and citation graphs, complementing the
assortativity scalar in :func:`aggregations.graph_stats`.

Spark shape — the whole CURVE without a per-k loop: both counts are
SUFFIX sums of two tiny histograms,

    N_k = Σ_{d > k} hist_deg(d)          (degree histogram)
    E_k = Σ_{d > k} hist_minedge(d)      (histogram of min(deg(a), deg(b)))

because an edge survives the "> k" cut exactly when the SMALLER
endpoint degree exceeds k.  So: one degree aggregate, one edge→degree
join pair, two histograms (map-side combined), and one running-sum
window over the histogram domain (|distinct degrees| rows — KB-sized
even at 10^12 edges, but still windowed over a single ordered spec, so
it is partitioned by a constant bucket: acceptable because the input
is the histogram, not the edge table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rich_club(edges: DataFrame, *, max_k: int | None = None) -> DataFrame:
    """DF[k, n_nodes, n_edges, phi] for every k with N_k >= 2, from the
    undirected simple graph of ``edges``.  ``max_k`` truncates the
    curve (the tail with N_k < 2 is dropped regardless — φ undefined)."""
    # materialized once each: und feeds deg AND the min-endpoint join;
    # deg feeds its histogram AND both endpoint joins — lazily chained,
    # the edge-table distinct re-ran once per consumer
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # histogram of degrees and of per-edge min endpoint degree
    hd = deg.groupBy("deg").agg(F.count("*").alias("nd"))
    me = (
        und.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
        .select(F.least("da", "db").alias("deg"))
        .groupBy("deg")
        .agg(F.count("*").alias("ne"))
    )
    # materialize the KB-sized histogram once: both the curve and the
    # k=0 row read it, and recomputing it would re-scan the edge table
    hist = (
        hd.join(me, "deg", "full")
        .select(
            "deg",
            F.coalesce(F.col("nd"), F.lit(0)).alias("nd"),
            F.coalesce(F.col("ne"), F.lit(0)).alias("ne"),
        )
        .localCheckpoint(eager=True)
    )
    # suffix sums over the (tiny) histogram: rows following current
    w = Window.orderBy("deg").rowsBetween(1, Window.unboundedFollowing)
    curve = hist.select(
        (F.col("deg")).alias("k"),
        F.coalesce(F.sum("nd").over(w), F.lit(0)).alias("n_nodes"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).alias("n_edges"),
    )
    # k = 0 row: everything with degree > 0 (all of und's vertices)
    zero = hist.agg(
        F.lit(0).alias("k"),
        F.sum("nd").alias("n_nodes"),
        F.sum("ne").alias("n_edges"),
    )
    out = zero.unionAll(curve).filter(F.col("n_nodes") >= 2).select(
        "k",
        "n_nodes",
        "n_edges",
        F.round(
            2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)), 6
        ).alias("phi"),
    )
    if max_k is not None:
        out = out.filter(F.col("k") <= max_k)
    return out
