"""Multinomial Naive Bayes — closed-form distributed text classifier.

Training-data-pipeline operator: CCNet/fastText-style corpus filtering
labels documents (language, quality tier, source domain) with a cheap
linear text classifier. Multinomial Naive Bayes is the closed-form
member of that family — training is nothing but token counts, so on
Spark it is ONE explode + ONE map-side-combined groupBy, no gradient
loop, no Python in the hot path — and scoring is a hash join against
the (label, token) log-probability table plus a keyed sum.

    log P(label | doc) ∝ log prior(label)
                         + SUM_{t in doc} log P(t | label)

with Laplace smoothing a:

    P(t | label) = (count(label, t) + a) / (tokens(label) + a * V)

where V = |corpus vocabulary|. Unseen (label, t) pairs fall back to
the label's smoothing floor a / (tokens(label) + a * V).

Scale shape: training shuffles (label, token) count pairs — bounded by
vocabulary x labels, not by corpus size (map-side combine does the
heavy lifting). Scoring explodes the document ONCE, hash-joins the
log-prob table keyed on the token (broadcast when it fits; stop-token
keys are heavy, AQE skew handling applies), and map-side-combines the
per-(doc, label) sum. The argmax is a per-doc window (partitioned by
doc id — parallel, not global). No Python UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    # whitespace tokens, same convention as data/textstats.py
    return F.split(F.col(text_col), " ")


def naive_bayes_train(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train from labeled documents; returns (class_stats, token_logp).

    class_stats: (label, log_prior, default_logp) — one row per label;
    log_prior = ln(docs_with_label / total_docs), default_logp = the
    smoothing floor for tokens unseen under that label.
    token_logp: (label, tok, logp) — ln of the smoothed multinomial
    estimate, one row per (label, distinct token seen under label).
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    toks = docs.select(
        F.col(label_col).alias("label"), F.explode(_tokens(text_col)).alias("tok")
    )
    counts = toks.groupBy("label", "tok").agg(F.count("*").alias("c"))
    label_tot = counts.groupBy("label").agg(F.sum("c").alias("tot"))
    vocab = counts.select("tok").distinct().agg(F.count("*").alias("V"))
    # "n_lbl"/"n_all", not "n"/"N": Spark resolves names case-
    # insensitively by default, so n vs N would be AMBIGUOUS_REFERENCE
    n_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_lbl")
    )
    total = n_docs.agg(F.sum("n_lbl").alias("n_all"))

    a = float(smoothing)
    class_stats = (
        n_docs.crossJoin(F.broadcast(total))
        .join(label_tot, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(
                F.col("n_lbl").cast("double") / F.col("n_all").cast("double")
            ).alias("log_prior"),
            F.log(
                F.lit(a)
                / (F.col("tot").cast("double") + F.lit(a) * F.col("V").cast("double"))
            ).alias("default_logp"),
        )
    )
    token_logp = (
        counts.join(label_tot, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "tok",
            F.log(
                (F.col("c").cast("double") + F.lit(a))
                / (F.col("tot").cast("double") + F.lit(a) * F.col("V").cast("double"))
            ).alias("logp"),
        )
    )
    return class_stats, token_logp


def naive_bayes_classify(
    docs: DataFrame,
    class_stats: DataFrame,
    token_logp: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under every label; returns
    (id, pred, score) with pred = argmax label and score its
    log-posterior (up to the shared evidence constant), rounded to 6
    decimals. Ties break on the smaller label (deterministic).
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok")
    )
    # every (doc-token, label) pair; unseen pairs fall back to the floor
    scored = (
        toks.crossJoin(F.broadcast(class_stats))
        .join(token_logp, ["label", "tok"], "left")
        .groupBy("id", "label")
        .agg(
            (
                F.first("log_prior")
                + F.sum(F.coalesce(F.col("logp"), F.col("default_logp")))
            ).alias("score")
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "id",
            F.col("label").alias("pred"),
            F.round("score", 6).alias("score"),
        )
    )
