"""Inverted index construction over the documents table.

The foundational text-retrieval structure a training-data pipeline
needs for decontamination lookups, targeted corpus slicing, and
term-level auditing: term → (document frequency, sorted posting list).
Beyond-reference data operator on the same tier as the TF-IDF and
fingerprint queries (the reference's text surface is the search-API
string aggregations, Graph.scala:66-90 / aggregates `BySubstring`).

Scale shape: one explode + distinct (term-keyed shuffle), one count
aggregate with map-side partial combine, and a rank-then-collect for
the capped posting lists: the ``top_postings`` cap is applied BEFORE
`collect_list` (row_number window, sort-based and spillable), so a
stopword-grade term never materializes its full posting list in one
aggregation buffer — an uncapped "the" at 10^10 docs would be a
single-key array; here per-term state is O(top_postings), and full
lists stay queryable from the per-(term, doc) :func:`postings` table.
All JVM expressions, no Python.  The df count and the capped head make
two passes over the (term, doc) relation; callers for whom the explode
dominates the scan can persist :func:`postings` themselves and pass it
through — both aggregates read whatever plan backs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DF[term, id] — distinct (term, document) occurrences."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


def bm25_topk(
    docs: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 (Robertson & Walker, SIGIR'94) top-``k`` documents
    per term — the retrieval-grade ranking the inverted index feeds
    (:func:`inverted_index` stores WHERE a term occurs; this ranks
    HOW WELL each document matches it):

        bm25(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t)     = ln( (N - df + 0.5) / (df + 0.5) + 1 )      (Lucene form)

    with tf the term count in d, dl the document token length, avgdl
    the corpus mean length, N the corpus size, df the term's document
    frequency. Terms with df < ``min_df`` are dropped. Returns
    DataFrame[term, df, id, bm25] — the top-``k`` docs per surviving
    term, bm25 rounded to 6 dp BEFORE the cut (ties broken by id
    ascending) so the boundary is decided on the same grid in every
    engine.

    Scale shape: one explode → (id, term, tf) count with map-side
    partial combine; df is a second aggregate over the same relation;
    N/avgdl is one broadcast scalar row; the per-term top-k is a
    row_number window — sort-based and spillable, cap applied BEFORE
    any materialization, so a stopword-grade term costs a sort of its
    postings, never an array. All JVM expressions, no Python.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    tf = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = docs.agg(F.count("*").alias("N")).crossJoin(
        dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    )
    df_tab = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= int(min_df)
    )
    scored = (
        tf.join(df_tab, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            "id",
            F.round(
                F.log(
                    (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).alias("bm25"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("bm25").desc(), F.col("id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def inverted_index(
    docs: DataFrame,
    *,
    min_df: int = 1,
    top_postings: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_df: DataFrame | None = None,
) -> DataFrame:
    """DF[term, df, postings] — document frequency and the first
    ``top_postings`` doc ids (ascending) per term, comma-joined into a
    string (deterministic, engine-portable).  Terms with df < ``min_df``
    are dropped (df=1 terms are half a natural corpus's vocabulary and
    index noise).  Pass a persisted :func:`postings` as ``postings_df``
    to share one explode across both aggregates."""
    p = (
        postings_df
        if postings_df is not None
        else postings(docs, id_col=id_col, text_col=text_col)
    )
    df_tab = p.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("id")
    head = (
        p.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_postings)
        .groupBy("term")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("id"))).alias("postings")
        )
    )
    return (
        df_tab.filter(F.col("df") >= min_df).join(head, "term")
        .select("term", "df", "postings")
    )
