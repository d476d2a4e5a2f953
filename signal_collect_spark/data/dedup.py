"""Deduplication operators over a documents table (id, text).

Five tiers, all deterministic (seeded constants, no wall-clock):

  * exact_duplicates      — hash-groupBy on the full text
  * ngram_jaccard_pairs   — exact word-shingle Jaccard over candidate
                            pairs that share ≥1 shingle
  * minhash_signatures / minhash_lsh_candidates
                          — MinHash (k universal hashes over shingle
                            hashes) + banded LSH bucket join
  * simhash_signatures    — 64-bit SimHash + prefix buckets

Scale notes:
  * everything is expression-only (whole-stage codegen) except nothing —
    no Python in any hot path.
  * the shingle⋈shingle candidate join is the classic blow-up point:
    ``max_df`` drops shingles appearing in more than that many docs
    (stopword-shingles contribute candidates quadratically but no
    discriminative signal). Logged, not silent: callers see the knob.
  * MinHash banding turns O(n²) similarity into an equi-join on
    (band_id, band_hash) — the 100 TB path; exact Jaccard then verifies
    only the candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1, modulus for universal hashing


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (canonical_id = min id, n_dups).
    ≙ duplicate-vertex merge semantics (ExistingVertexHandler)."""
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups")
    ).select("canonical_id", "n_dups")


def word_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    Tokenization = split on single spaces (the corpus is space-joined);
    n-grams assembled with a window-free self-zip: tokens exploded with
    position, joined pos+1..pos+n-1 — no, cheaper: slice the token
    array with transform(sequence(...)) entirely in one projection.
    """
    toks = F.split(F.col(text_col), " ")
    # positions 0 .. size-n (empty when the doc has fewer than n tokens;
    # sequence() would count DOWN for start>stop, so gate explicitly)
    idxs = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.expr("array()").cast("array<int>"))
    shingles = F.transform(
        idxs, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets for every pair of
    docs sharing ≥1 (non-stop) shingle: (id_a, id_b, jaccard), id_a<id_b,
    jaccard ≥ threshold.
    """
    sh = word_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = sh.join(df_counts.filter(F.col("df") <= max_df), "shingle", "left_semi")
    sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing mod 2^31-1."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31)) for _ in range(k)]


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig array<long> of length num_hashes).

    h_i(shingle) = (a_i * x + b_i) mod (2^31-1) where
    x = xxhash64(shingle) mod (2^31-1) — all JVM-side; the signature is
    num_hashes min-aggregates in ONE groupBy pass (partial-aggregated
    map-side, so the shuffle carries k longs per doc, not the shingles).
    """
    sh = word_shingles(docs, n=n, id_col=id_col, text_col=text_col)
    x = F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE31))
    params = _hash_params(num_hashes)
    aggs = [
        F.min(F.pmod(F.lit(a) * x + F.lit(b), F.lit(MERSENNE31))).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, n_bands matched)
    from banded MinHash LSH: docs sharing ≥1 of ``bands`` band-hashes.

    rows-per-band r = num_hashes/bands sets the S-curve threshold
    t ≈ (1/bands)^(1/r). The band join is an equi-join on
    (band, band_hash) — linear shuffle, no O(n²).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes=num_hashes, n=n, id_col=id_col, text_col=text_col)
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]))
                for b in range(bands)
            ])
        ).alias("band", "band_hash"),
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def simhash_signatures(
    docs: DataFrame, bits: int = 64, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash long, bucket int): 64-bit SimHash over word tokens.

    Per token: xxhash64; per bit: Σ ±1 over tokens; sign → bit. All as
    ``bits`` conditional-sum aggregates in one groupBy (codegen'd).
    bucket = top-16 bits — a cheap blocking key for Hamming-
    neighbour search.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_bit = toks.groupBy("id").agg(*aggs)
    sim = None
    for i in range(bits):
        # shiftleft wraps correctly at bit 63 (a Python 1<<63 literal
        # would overflow LongType)
        bit_val = F.shiftleft(F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
        sim = bit_val if sim is None else sim.bitwiseOR(bit_val)
    return per_bit.select(
        "id",
        sim.alias("simhash"),
    ).withColumn("bucket", F.shiftrightunsigned(F.col("simhash"), 64 - 16).cast("int"))
