"""Text analysis operators over a documents table — all expression-only
(whole-stage codegen; zero Python in the scan).

  * token_stats       — token count, char count, avg token length
  * quality_score     — length/punct/stopword-ratio heuristic
  * lang_id           — stopword-overlap n-gram-free heuristic
  * doc_fingerprint   — order-sensitive polynomial rolling hash
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# deterministic mini stopword lists (top function words)
STOPWORDS = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "del"],
    "de": ["der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"],
}

_EN = STOPWORDS["en"]


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len)."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.size(toks)
        ).alias("avg_token_len"),
    )


def stopword_ratio(text_col: str, stopwords: list[str]):
    toks = _tokens(text_col)
    sw = F.filter(toks, lambda t: t.isin(*stopwords))
    return F.size(sw) / F.size(toks)


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, stop_ratio, punct_ratio, score) — a deterministic
    quality heuristic of the usual pretraining-filter shape:
    score = clamp01(len_norm) * (0.5 + stop_ratio) * (1 - punct_ratio)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    stop = stopword_ratio(text_col, _EN)
    punct = (
        F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
        / F.greatest(F.length(F.col(text_col)), F.lit(1))
    )
    len_norm = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return docs.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        stop.alias("stop_ratio"),
        punct.alias("punct_ratio"),
        (len_norm * (F.lit(0.5) + stop) * (F.lit(1.0) - punct)).alias("score"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang, confidence): argmax stopword-overlap ratio across
    the configured languages; 'und' when nothing matches."""
    scores = [
        stopword_ratio(text_col, sws).alias(f"s_{lang}") for lang, sws in STOPWORDS.items()
    ]
    scored = docs.select(F.col(id_col).alias("id"), *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit("und")
    # reversed so earlier langs win ties deterministically
    for lg in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"s_{lg}") == best), F.lit(lg)).otherwise(pred)
    return scored.select("id", pred.alias("pred_lang"), best.alias("confidence"))


def repetition_stats(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_grams, dup_gram_frac, top_gram_frac): within-document
    repetition signals (the Gopher-style quality filters): the fraction
    of word n-grams that are repeats of an earlier occurrence, and the
    share the single most-repeated n-gram holds. High values flag
    boilerplate/spam pages a training-data pipeline drops.

    Shape: one explode + two aggregations keyed by doc id — no joins,
    map-side combined, linear in corpus size. Docs with fewer than n
    words report zero grams (fractions 0.0).
    """
    toks = F.split(F.col(text_col), " ")
    idxs = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    per_gram = (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").alias("c"))
    )
    stats = per_gram.groupBy("id").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top"),
    )
    out = stats.select(
        "id",
        F.col("total").cast("long").alias("n_grams"),
        (1.0 - F.col("n_distinct") / F.col("total")).alias("dup_gram_frac"),
        (F.col("top") / F.col("total")).alias("top_gram_frac"),
    )
    # docs too short to have any n-gram still get a row (fractions 0).
    # The right side is aliased: with id_col == "id" an unaliased join
    # condition is ambiguous and raises (ADVICE r3)
    seen = out.select(F.col("id").alias("__seen_id"))
    short = docs.join(seen, docs[id_col] == F.col("__seen_id"), "left_anti").select(
        F.col(id_col).alias("id"),
        F.lit(0).cast("long").alias("n_grams"),
        F.lit(0.0).alias("dup_gram_frac"),
        F.lit(0.0).alias("top_gram_frac"),
    )
    return out.unionAll(short)


# GPT-2-style pre-tokenizer pattern, minus the trailing-space lookahead
# (RE2 — DuckDB's engine — has no lookahead, and the oracle must run the
# SAME pattern): contractions, optionally-space-prefixed letter runs,
# digit runs, punctuation runs, then whitespace runs. Leftmost-first
# alternation in both Java regex and RE2.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bpe_tokens, n_ws_tokens): subword-style token count from
    the BPE pre-tokenizer regex (the unit LLM data budgets are priced
    in) next to the whitespace count — all expression-only, zero Python
    in the scan. Whitespace-run matches are excluded from n_bpe_tokens
    (they delimit, they don't cost tokens)."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    non_ws = F.filter(pieces, lambda p: F.trim(p) != "")
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(non_ws).alias("n_bpe_tokens"),
        F.size(_tokens(text_col)).alias("n_ws_tokens"),
    )


def doc_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "portable",
) -> DataFrame:
    """(id, fingerprint): order-sensitive polynomial rolling hash over
    token hashes: f = Σ h(tok_i)·31^(n-1-i) mod 2^56 — equal texts ⇒
    equal fingerprints, permuted texts differ (unlike a set hash).
    Modulus 2^56 keeps acc*31 + h < 2^63 (no LongType overflow).

    hash_fn='portable' (md5-60, default) makes fingerprints
    reproducible by a DuckDB list_reduce oracle; 'xxhash64' is the
    JVM-only fast path."""
    from signal_collect_spark.data.hashing import hash_fn_column

    mask = (1 << 56) - 1
    toks = _tokens(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + hash_fn_column(hash_fn, t).bitwiseAND(F.lit(mask))).bitwiseAND(
            F.lit(mask)
        ),
    )
    return docs.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


# PII patterns — RE2-compatible (no lookahead/backreference) so the
# DuckDB oracle runs the IDENTICAL patterns; \b and \d mean the same
# ASCII thing in Java regex and RE2
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text_redacted, n_emails, n_ipv4, n_phones): regex PII scrub
    of the standard pretraining-pipeline shape — emails, IPv4 addresses
    and phone-like digit groups replaced with typed placeholder tokens,
    with per-document match counts for audit/filter thresholds.

    Counts are taken BEFORE redaction; replacements apply in a fixed
    order (email → ipv4 → phone) so the three patterns cannot see each
    other's placeholders. Expression-only: three regexp_extract_all +
    three regexp_replace per row, all whole-stage-codegen'd — zero
    Python in the scan, linear in corpus bytes, embarrassingly
    partition-parallel (no shuffle at all).
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    n_ipv4 = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0))
    red = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("id"),
        red.alias("text_redacted"),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tf, df, tfidf) — the ``k`` highest-scoring terms per
    document under plain TF-IDF: tf = raw in-document count, idf =
    ln(N / df) with N = corpus size, df = number of documents containing
    the term. Ties (and float noise) are pinned by ranking on the
    6-dp-ROUNDED score with term as tie-break, so the top-k set is
    deterministic and SQL-replayable.

    Scale shape: explode → partial-aggregated (doc, term) counts → one
    term-keyed aggregation for df → term-keyed join back → per-doc
    window (WindowGroupLimit ships only k survivors per doc past the
    sort). N comes from a 1-row aggregate crossJoined broadcast-style —
    no driver action, the whole plan stays lazy. The reference has no
    text surface; this extends its mapReduce/TopK aggregation family
    (AggregationOperations.scala:60-96) to the documents table.
    """
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def corpus_profile(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Per-group EXACT length-distribution profile of a corpus: one row
    per (group, quantile) with the char-length and whitespace-token
    quantiles plus the group's doc count.

    The pipeline use: picking per-source length-filter thresholds and
    corpus-mix weights needs the length DISTRIBUTION per source, not
    just means — the p99 is where boilerplate/concatenation bugs show.

    Scale shape: one scan computing two tiny per-row ints, then ONE
    map-side-combinable grouped aggregate (``percentile`` is Spark's
    exact sort-based aggregate — the group cardinality is the number
    of SOURCES, so per-group sorted buffers are bounded by group row
    counts; for billion-row groups swap in ``percentile_approx`` at
    the call site, which this sandbox's oracle can't hash-match).
    Quantile semantics are linear interpolation at rank p*(n-1) —
    identical in Spark ``percentile`` and DuckDB ``quantile_cont``,
    which is what makes the result value-checkable.
    """
    qs = [float(q) for q in quantiles]
    qarr = F.array(*[F.lit(q) for q in qs])
    m = docs.select(
        F.col(group_col).alias("grp"),
        F.length(text_col).cast("double").alias("chars"),
        F.size(_tokens(text_col)).cast("double").alias("tokens"),
    )
    agg = m.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.percentile("chars", qarr).alias("qc"),
        F.percentile("tokens", qarr).alias("qt"),
    )
    z = F.explode(
        F.arrays_zip(qarr.alias("p"), F.col("qc").alias("cq"), F.col("qt").alias("tq"))
    )
    return agg.select("grp", "n_docs", z.alias("z")).select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.col("z.p").alias("p"),
        F.round("z.cq", 6).alias("chars_q"),
        F.round("z.tq", 6).alias("tokens_q"),
    )


def unigram_xent(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, xent_bits): per-document cross-entropy in bits
    under the corpus's OWN unigram MLE — the language-model quality
    proxy of the CCNet/Gopher filtering recipe, self-trained so it
    needs no external model artifact: documents whose token
    distribution is far from the corpus's (gibberish, boilerplate,
    wrong language) score high.

        xent(d) = -(1/|d|) * SUM_{t in d} log2( count(t) / T )

    where count(t) is the corpus-wide token frequency and T the total
    token count. Every scored token was seen in training by
    construction, so the MLE needs no smoothing.

    Scale shape: one explode pass builds (doc, token) rows; token
    frequencies are ONE map-side-combined count; the score join is a
    hash equi-join keyed on the token — stop-token keys are heavy, so
    at full scale enable AQE skew-join handling (engine default) or
    broadcast the head of the frequency table; the final per-doc
    aggregate map-side-combines. No windows, no Python, no collect.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = tf.agg(F.sum("c").alias("T"))
    return (
        toks.join(tf, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                -F.avg(F.log2(F.col("c").cast("double") / F.col("T").cast("double"))),
                6,
            ).alias("xent_bits"),
        )
    )


def bigram_xent(
    docs: DataFrame,
    *,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_pairs, xent_bits): per-document cross-entropy in bits
    under the corpus's OWN add-k-smoothed bigram model — the next LM
    order above :func:`unigram_xent` in the CCNet/Gopher filtering
    family, sensitive to scrambled word ORDER that a unigram model
    cannot see (bag-of-words gibberish scores normal on unigrams but
    high here):

        xent(d) = -(1/(|d|-1)) * SUM_i log2 p(t_i | t_{i-1})
        p(b|a)  = (c_ab + k) / (c_a + k * V)

    with c_ab the corpus adjacent-pair count, c_a the unigram count of
    the CONTEXT token, V the vocabulary size, k = ``add_k`` (Laplace
    for k=1; 0.5 is the classic Jeffreys choice). Every scored pair
    was seen at least once by construction (self-trained), but
    smoothing is still required so held-out use of the same model is
    well-defined. Documents with fewer than 2 tokens have no pairs and
    report n_pairs = 0, xent_bits NULL.

    Scale shape: one adjacent-pair explode (``arrays_zip`` over two
    slices — no positional self-join), ONE map-side-combined pair
    count, one unigram count, a pair-keyed and a context-keyed hash
    join (stop-token context keys are heavy → AQE skew handling,
    engine default), one broadcast scalar (V), and a per-doc aggregate
    with partial combine. No windows, no Python, no collect.
    """
    ts = _tokens(text_col)
    dpairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.arrays_zip(
                F.expr(
                    f"slice(split({text_col}, ' '), 1, "
                    f"greatest(size(split({text_col}, ' ')) - 1, 0))"
                ).alias("a"),
                F.expr(
                    f"slice(split({text_col}, ' '), 2, "
                    f"greatest(size(split({text_col}, ' ')) - 1, 0))"
                ).alias("b"),
            )
        ).alias("p"),
    ).select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pair_c = dpairs.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    uni = (
        docs.select(F.explode(ts).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_a"))
    )
    vocab = uni.agg(F.count("*").alias("V"))
    scored = (
        dpairs.join(pair_c, ["a", "b"])
        .join(uni.withColumnRenamed("tok", "a"), "a")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                -F.avg(
                    F.log2(
                        (F.col("c_ab") + F.lit(add_k))
                        / (F.col("c_a") + F.lit(add_k) * F.col("V"))
                    )
                ),
                6,
            ).alias("xent_bits"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            "xent_bits",
        )
    )


def token_pmi(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 5,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-token collocations by pointwise mutual
    information (Church & Hanks, CL 1990) — the classic corpus-level
    phrase detector (what word2phrase / Gensim's Phrases score):

        pmi(a, b) = log2( (c_ab / P) / ((c_a / T) · (c_b / T)) )

    with c_ab the adjacent-pair count (P pairs total), c_a/c_b the
    unigram counts (T tokens total). ``min_count`` suppresses the
    low-frequency pairs whose PMI is spuriously high (the standard
    correction). Returns (a, b, pair_count, pmi) ordered by
    (pmi DESC, a, b); pmi is ROUNDED to 6 dp BEFORE the top-k cut so
    the boundary is decided on the same grid in every engine.

    Scale shape: one explode for pairs + one for unigrams, two
    map-side-combined counts, two hash equi-joins on the token key
    (skew on stop-tokens → AQE skew handling, engine default), and an
    orderBy().limit(k) top-k — Spark's TakeOrdered, a per-partition
    heap + driver merge of k rows, NOT a global sort. No windows, no
    Python.
    """
    if k < 1 or min_count < 1:
        raise ValueError("k and min_count must be >= 1")
    ts = _tokens(text_col)
    toks = docs.select(ts.alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ts, 1, greatest(size(ts) - 1, 0))").alias("a"),
                    F.expr("slice(ts, 2, greatest(size(ts) - 1, 0))").alias("b"),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    totals = uni.agg(
        F.sum("c").alias("T"),
    ).crossJoin(
        toks.select((F.greatest(F.size("ts") - 1, F.lit(0))).alias("np")).agg(
            F.sum("np").alias("P")
        )
    )
    pmi = (
        pairs.join(uni.select(F.col("tok").alias("a"), F.col("c").alias("ca")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "pair_count",
            F.round(
                F.log2(
                    (F.col("pair_count").cast("double") / F.col("P").cast("double"))
                    / (
                        (F.col("ca").cast("double") / F.col("T").cast("double"))
                        * (F.col("cb").cast("double") / F.col("T").cast("double"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return pmi.orderBy(F.col("pmi").desc(), "a", "b").limit(k)


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    *,
    top_ranks: int = 100,
) -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution: least-squares
    slope/intercept of ln(freq) over ln(rank) for the ``top_ranks``
    most frequent tokens — the one-row corpus health summary every
    training-data report carries (a natural corpus sits near slope -1;
    a flat slope flags boilerplate/duplication, a cliff flags template
    spam; Piantadosi 2014 reviews the diagnostic).

    Scale shape: one explode + map-side-combined token counts (the
    same shuffle `token_stats` already pays), then TakeOrdered pulls
    the top_ranks head — the ONLY single-partition step touches
    ``top_ranks`` rows (<= 100s), never the vocabulary. The regression
    is one aggregate of five sums over those rows. No Python.
    """
    if top_ranks < 2:
        raise ValueError("top_ranks must be >= 2")
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    top = counts.orderBy(F.desc("freq"), F.asc("tok")).limit(top_ranks)
    ranked = top.select(
        "freq",
        F.row_number()
        .over(W.orderBy(F.desc("freq"), F.asc("tok")))
        .alias("rank"),
    )
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.log("rank")).alias("sx"),
        F.sum(F.log("freq")).alias("sy"),
        F.sum(F.log("rank") * F.log("freq")).alias("sxy"),
        F.sum(F.log("rank") * F.log("rank")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )
