"""URL canonicalization + anchor-text extraction vs pure-Python rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from signal_collect_spark.data.web import (
    anchor_texts,
    dedup_urls,
    normalize_url,
    url_host,
)


CASES = [
    # (raw, canonical, host)
    ("http://x.com/a", "http://x.com/a", "x.com"),
    ("HTTP://X.COM/a", "http://x.com/a", "x.com"),
    ("http://x.com:80/a", "http://x.com/a", "x.com"),
    ("https://x.com:443/a", "https://x.com/a", "x.com"),
    ("http://x.com:8080/a", "http://x.com:8080/a", "x.com"),
    ("http://x.com/a#frag", "http://x.com/a", "x.com"),
    ("http://x.com/a/", "http://x.com/a", "x.com"),
    ("http://x.com/", "http://x.com/", "x.com"),
    ("http://x.com", "http://x.com/", "x.com"),
    # path/query case preserved, query kept, fragment after query dropped
    ("http://x.com/A/B?Q=Vv#f", "http://x.com/A/B?Q=Vv", "x.com"),
    ("HtTpS://MiXeD.Org:443/Keep/Case", "https://mixed.org/Keep/Case", "mixed.org"),
    # non-URL strings pass through unchanged; host is ''
    ("not a url", "not a url", ""),
    ("doc123", "doc123", ""),
]


def test_normalize_and_host(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "url string")
    got = {
        r["url"]: (r["norm"], r["host"])
        for r in df.select(
            "url",
            normalize_url("url").alias("norm"),
            url_host("url").alias("host"),
        ).collect()
    }
    for raw, canon, host in CASES:
        assert got[raw] == (canon, host), raw


def test_dedup_urls_counts_variants(spark):
    variants = [
        "http://x.com/a", "HTTP://x.com/a", "http://X.COM:80/a",
        "http://x.com/a#top", "http://x.com/a/",
        "http://y.com/b",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    got = {r["url_norm"]: r["n_variants"] for r in dedup_urls(df).collect()}
    assert got == {"http://x.com/a": 5, "http://y.com/b": 1}


def test_anchor_texts(spark):
    html = (
        '<p><a href="u1"> <b>Go</b>  now </a>'
        "<a href='u2' class=\"c\">plain</a>"
        '<a href="u3"></a>'          # empty body -> empty anchor, kept
        '<a href="">skipped</a>'     # regex needs 1+ chars in href
        '<a href="u4">unclosed'      # no </a> -> dropped
        "</p>"
    )
    pages = spark.createDataFrame([("s", html)], "url string, html string")
    rows = sorted(
        (r["src"], r["dst"], r["anchor"]) for r in anchor_texts(pages).collect()
    )
    assert rows == [("s", "u1", "Go now"), ("s", "u2", "plain"), ("s", "u3", "")]


def test_anchor_multiplicity_preserved(spark):
    html = '<a href="d">x</a><a href="d">x</a>'
    pages = spark.createDataFrame([("s", html)], "url string, html string")
    assert anchor_texts(pages).count() == 2


def test_normalize_is_expression_only(spark):
    """The projection must stay in the scan: no BatchEvalPython /
    ArrowEvalPython nodes (whole-stage codegen path)."""
    df = spark.range(10).select(
        F.concat(F.lit("HTTP://H"), F.col("id"), F.lit(".COM:80/p")).alias("url")
    )
    plan = df.select(normalize_url("url").alias("u"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
