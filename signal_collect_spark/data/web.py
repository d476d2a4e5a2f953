"""URL canonicalization and anchor-text extraction — the web-side
ingest operators of a link-graph pipeline.

The reference's WebCrawler example (examples/WebCrawler.scala:29-67)
extracts raw hrefs and builds the graph on raw strings; at web scale
the frontier/dedup layer canonicalizes URLs first (otherwise
``HTTP://X.COM:80/a#top`` and ``http://x.com/a`` crawl twice and split
PageRank mass), and anchor text is the classic relevance signal
attached to each edge. Both operators are pure column expressions
(regexp on the URL grammar), whole-stage codegen, no Python — so they
run inside the parquet scan projection at any scale and DuckDB can
cross-check them.

Canonicalization rules (the conservative, semantics-preserving subset
of RFC 3986 §6):

  1. scheme lowercased
  2. host (and any port) lowercased; path/query case preserved
  3. default port stripped (``:80`` for http, ``:443`` for https)
  4. fragment stripped (never sent to the server)
  5. one trailing ``/`` stripped from a non-root path
  6. empty path becomes ``/``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def normalize_url(col) -> Column:
    """Canonical form of a URL column (see module docstring rules).
    Non-URL strings (no ``scheme://``) pass through unchanged."""
    col = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(col, _URL_RE, 1))
    hostport = F.lower(F.regexp_extract(col, _URL_RE, 2))
    path = F.regexp_extract(col, _URL_RE, 3)
    query = F.regexp_extract(col, _URL_RE, 4)

    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)

    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)

    rebuilt = F.concat(scheme, F.lit("://"), hostport, path, query)
    return F.when(scheme == "", col).otherwise(rebuilt)


def url_host(col) -> Column:
    """Lowercased host (port stripped) of a URL column; '' for non-URLs."""
    col = F.col(col) if isinstance(col, str) else col
    hostport = F.lower(F.regexp_extract(col, _URL_RE, 2))
    return F.regexp_extract(hostport, r"^([^:]*)", 1)


def normalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Append the canonical URL column (expression-only projection)."""
    return df.withColumn(out_col, normalize_url(url_col))


def dedup_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per canonical URL with its raw-variant count — the crawl
    frontier dedup. One hash aggregation on the normalized key (the
    skew profile follows hosts, same mitigation as any hot-key agg:
    map-side combine absorbs per-partition duplicates first)."""
    return (
        df.select(normalize_url(url_col).alias("url_norm"))
        .groupBy("url_norm")
        .agg(F.count("*").alias("n_variants"))
    )


# anchor extraction: the reference hyperlink regex (Regex.hyperlink,
# WebCrawler.scala:28) with the anchor BODY captured (group 3) instead
# of consumed, so href and text come from the same match.
ANCHOR_RE = r"""(?s)<a\s+href=(?:"([^"]+)"|'([^']+)')[^>]*>(.*?)</a>"""


def anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst, anchor): one row per hyperlink with its anchor text —
    inner markup stripped, whitespace collapsed/trimmed. Document
    order and duplicates preserved (anchor multiplicity is signal).
    Pure regexp projection like extract_links (crawler.py)."""
    dq = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 1)
    sq = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 2)
    body = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 3)
    zipped = F.arrays_zip(
        F.zip_with(dq, sq, lambda a, b: F.when(a == "", b).otherwise(a)).alias("dst"),
        body.alias("body"),
    )
    out = pages.select(
        F.col(url_col).alias("src"), F.explode(zipped).alias("z")
    ).select(
        "src",
        F.col("z.dst").alias("dst"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("z.body"), r"<[^>]*>", ""),
                r"\s+",
                " ",
            )
        ).alias("anchor"),
    )
    return out.filter(F.col("dst") != "")


def crawl_schedule(
    df: DataFrame,
    url_col: str = "url_norm",
    host_col: str = "host",
    *,
    width: int = 2,
    hash_fn: str = "portable",
    seed: str = "crawl|",
) -> DataFrame:
    """Politeness-aware crawl-frontier schedule: at most ``width``
    fetches per host per round.

    Every crawler operating at link-graph scale rate-limits per host
    (the WebCrawler example fetches serially so never needs this; a
    1000-executor fleet does). URLs are ordered within their host by
    the portable 60-bit hash of ``seed || url`` (deterministic,
    decorrelated from crawl order, SQL-replayable) and packed into
    rounds of ``width``:

      fetch_round = (rank - 1) // width,  slot = (rank - 1) % width

    Scale shape: ONE shuffle keyed on host; the per-host row_number
    window is the unavoidable sequential politeness constraint itself
    (a host's queue IS a serial resource) — partitions hold single
    hosts, so a hot host costs one linear scan, never a cross-host
    barrier. Everything is JVM expressions; no collect, no Python.
    """
    if width < 1:
        raise ValueError("width must be >= 1")
    from pyspark.sql import Window

    from signal_collect_spark.data.hashing import hash_fn_column

    hh = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(url_col)))
    w = Window.partitionBy(host_col).orderBy(hh, F.col(url_col))
    rk = F.row_number().over(w) - 1
    return df.select(
        F.col(url_col),
        F.col(host_col),
        (rk / width).cast("long").alias("fetch_round"),
        (rk % width).cast("long").alias("slot"),
    )
