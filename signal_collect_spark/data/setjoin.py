"""Exact set-similarity join with prefix filtering (PPJoin-style).

All-pairs Jaccard >= t over word-token sets without the quadratic
all-pairs shuffle: order every document's tokens by a single GLOBAL
ordering (ascending document frequency, ties by token — rarest first),
emit only each document's first n − ⌈t·n⌉ + 1 tokens as join keys, and
verify candidates exactly.  The prefix-filter guarantee (Chaudhuri,
Ganti, Kaushik, ICDE'06; Bayardo, Ma, Srikant, WWW'07 "scaling up all
pairs similarity search"): two sets with Jaccard >= t must share at
least one token inside both prefixes under any common total order, so
the candidate set has NO false negatives and the verified output is
exactly the brute-force answer.

Complements the resemblance-sketch path (``minhash_lsh_candidates``):
MinHash is probabilistic and signature-bounded; this join is exact and
its cost tracks how rare each document's rarest tokens are — the
standard trade at web scale, where the df-ascending order makes hot
tokens (stopwords) land outside most prefixes and the candidate
shuffle stays near-linear on natural corpora.

Scale shape: one df aggregate (token-keyed), one per-doc sort
(`sort_array`, JVM), one equi-join on prefix tokens with id_a < id_b,
one distinct, then a verify join keyed by doc id against the packed
token arrays (`array_intersect`, codegen) — no Python in any stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_set_arrays(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DF[id, tokens: array<string>, n: int] — distinct whitespace
    tokens per document, packed in GLOBAL (df asc, token asc) order so
    a position-p prefix means the p globally rarest tokens."""
    # per-document dedup happens INSIDE the row (array_distinct in
    # codegen) instead of a global (id, tok) distinct — that distinct
    # was a full extra shuffle of the exploded token table for a
    # strictly row-local property (guide §2.4)
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            )
        ).alias("tok"),
    )
    df_tab = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        toks.join(df_tab, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "tok"))), lambda s: s["tok"]
            ).alias("tokens")
        )
        .withColumn("n", F.size("tokens"))
    )
    return ordered


def prefix_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DF[id_a, id_b, jaccard] (id_a < id_b) — ALL pairs with word-set
    Jaccard >= ``threshold``, exact."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    sets = token_set_arrays(docs, id_col=id_col, text_col=text_col).persist()
    try:
        # prefix length n − ⌈t·n⌉ + 1.  The ceiling is taken with a small
        # epsilon guard: when t·n is mathematically an integer but the
        # double product rounds a hair above it, a bare ceil would
        # inflate by 1 and shorten the prefix — breaking the
        # no-false-negative guarantee of the prefix filter.
        prefix = sets.select(
            "id",
            "n",
            F.explode(
                F.slice(
                    "tokens",
                    1,
                    F.col("n")
                    - F.ceil(
                        F.lit(threshold) * F.col("n") - F.lit(1e-9)
                    ).cast("int")
                    + 1,
                )
            ).alias("tok"),
        )
        # length filter (Bayardo/PPJoin): jaccard >= t implies
        # min(na,nb) >= t * max(na,nb), so size-incompatible pairs are
        # pruned INSIDE the candidate join before the distinct/verify.
        # The 1e-6 slack only weakens pruning (never drops a true pair
        # to double rounding); the verify step stays exact either way.
        lf = (
            (F.col("x.n").cast("double") >= F.lit(threshold) * F.col("y.n") - F.lit(1e-6))
            & (F.col("y.n").cast("double") >= F.lit(threshold) * F.col("x.n") - F.lit(1e-6))
        )
        cand = (
            prefix.alias("x")
            .join(
                prefix.alias("y"),
                (F.col("x.tok") == F.col("y.tok"))
                & (F.col("x.id") < F.col("y.id"))
                & lf,
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        a = sets.select(F.col("id").alias("id_a"), F.col("tokens").alias("ta"), F.col("n").alias("na"))
        b = sets.select(F.col("id").alias("id_b"), F.col("tokens").alias("tb"), F.col("n").alias("nb"))
        inter = F.size(F.array_intersect("ta", "tb"))
        out = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                (inter.cast("double") / (F.col("na") + F.col("nb") - inter)).alias(
                    "jaccard"
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        sets.unpersist()
