"""Deterministic sequence packing — the concat-and-chunk pass that
turns a tokenized corpus into fixed-length training sequences.

LLM training consumes fixed-size sequences (e.g. 4096 tokens); the
standard high-throughput packing concatenates documents in a
deterministic order and slices the stream every ``seq_len`` tokens,
letting documents straddle chunk boundaries (GPT-style "packed"
datasets). That formulation is exactly a prefix-sum, so it distributes
as ONE window pass — no bin-packing heuristics, no driver loop, and
the output assignment is a pure function of (order key, token counts):
reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    order: str = "hash",
    seed: str = "pack|",
    hash_fn: str = "portable",
) -> DataFrame:
    """Assign every document a position in the packed token stream.

    Documents are ordered by ``order`` ('hash': md5-60 of seed||id — a
    deterministic shuffle, the right default so consecutive sequences
    mix sources; 'id': ascending id — stable curriculum order), then
    laid head-to-tail and cut every ``seq_len`` tokens.

    Returns (id, n_tokens, start_offset, seq_first, seq_last, n_seqs):
    token offset of the document in the global stream, the first and
    last sequence indices it lands in, and how many sequences it spans
    (documents longer than ``seq_len`` span several; empty documents
    occupy none and report seq_first = seq_last = the sequence their
    offset falls in with n_seqs = 0).

    Scale shape: a naive total-order window would put the whole corpus
    in ONE task (Spark's unpartitioned-window behavior). Instead, for
    the 'hash' order the high bits of the uniform hash key ARE a range
    partitioning — ordering by (bucket, key, id) equals ordering by
    (key, id) — so the prefix sum runs two-level: a per-bucket window
    (parallel across ~4×cores buckets, uniformly loaded because the
    hash is uniform) plus a bucket-offset table of B rows joined back
    broadcast-style. Only the B-row offset table is sequential. For
    'id' order there is no distribution guarantee to bucket on, so it
    keeps the single-partition window — use it for small curricula
    only (a loud warning comes from Spark itself).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if order == "hash":
        key = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    elif order == "id":
        key = F.col(id_col)
    else:
        raise ValueError(f"unknown order {order!r}: 'hash' | 'id'")
    toks = F.col(tokens_col).cast("long")
    keyed = docs.select(
        F.col(id_col).alias("id"),
        toks.alias("n_tokens"),
        key.alias("__k"),
    )
    if order == "hash":
        # bucket = high bits of the 60-bit hash: a power-of-two range
        # split, so (bucket, k, id) order == (k, id) order exactly
        spark = docs.sparkSession
        par = spark.sparkContext.defaultParallelism
        bits = max(1, (4 * par - 1).bit_length())
        keyed = keyed.withColumn("__b", F.shiftrightunsigned(F.col("__k"), 60 - bits))
        # ROWS frame pinned: the default frame with an ORDER BY is RANGE
        # UNBOUNDED PRECEDING -> CURRENT ROW, which hands every peer row
        # (duplicate ids tie on both k and id) the inclusive peer-group
        # sum — overlapping token spans. ROWS matches the oracle's frame;
        # the extra n_tokens order key makes intra-peer order (and hence
        # the output multiset) deterministic even for duplicate ids.
        in_bucket = F.sum("n_tokens").over(
            W.partitionBy("__b")
            .orderBy("__k", "id", "n_tokens")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        # B-row bucket totals → exclusive running offsets (tiny window)
        offsets = (
            keyed.groupBy("__b")
            .agg(F.sum("n_tokens").alias("__t"))
            .select(
                "__b",
                (
                    F.sum("__t").over(
                        W.orderBy("__b").rowsBetween(
                            W.unboundedPreceding, W.currentRow
                        )
                    )
                    - F.col("__t")
                ).alias("__off"),
            )
        )
        positioned = (
            keyed.withColumn("__cum", in_bucket)
            .join(F.broadcast(offsets), "__b")
            .select(
                "id",
                "n_tokens",
                (F.col("__off") + F.col("__cum") - F.col("n_tokens")).alias(
                    "start_offset"
                ),
            )
        )
    else:
        positioned = keyed.select(
            "id",
            "n_tokens",
            (
                F.sum("n_tokens").over(
                    W.orderBy("__k", "id", "n_tokens").rowsBetween(
                        W.unboundedPreceding, W.currentRow
                    )
                )
                - F.col("n_tokens")
            ).alias("start_offset"),
        )
    return (
        positioned.select(
            "id",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / seq_len).alias("seq_first"),
            F.floor(
                (F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
                / seq_len
            ).alias("seq_last"),
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.floor(
                    (F.col("start_offset") + F.col("n_tokens") - 1) / seq_len
                )
                - F.floor(F.col("start_offset") / seq_len)
                + 1
            ).alias("n_seqs"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    size: int,
    *,
    stride: int | None = None,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size overlapping token windows — the
    standard context-window chunking step of a training/RAG pipeline
    (:func:`pack_sequences` decides where documents land in the packed
    stream; this op cuts each document itself into model-sized pieces
    first).

    Windows start every ``stride`` tokens (default: ``size``, i.e.
    non-overlapping; stride < size yields the classic sliding overlap)
    and hold ``size`` tokens each, except the final window which keeps
    the tail (dropped when shorter than ``min_tokens``). Tokens are the
    corpus convention: whitespace-split.

    Returns DataFrame[id, chunk_idx, start_tok, n_tokens, chunk_text]
    with chunk_idx 0-based in document order. Empty documents emit no
    chunks.

    Scale shape: expression-only — one ``sequence``/``posexplode`` per
    document (fan-out = ceil(n/stride), bounded and proportional to
    output size, never quadratic) and a ``slice`` + ``array_join`` per
    window; no shuffle at all beyond the parent scan's partitioning,
    no windows, no Python. A 100 TB corpus chunks embarrassingly
    parallel in the scan stage.
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    stride = size if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")
    if min_tokens < 1 or min_tokens > size:
        raise ValueError("min_tokens must be in [1, size]")
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("id"), toks.alias("__ts"), F.size(toks).alias("__n")
    ).filter(F.col("__n") > 0)
    chunks = base.select(
        "id",
        "__ts",
        F.posexplode(
            F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
        ).alias("chunk_idx", "start_tok"),
    ).select(
        "id",
        "chunk_idx",
        "start_tok",
        F.slice(F.col("__ts"), F.col("start_tok") + 1, F.lit(size)).alias("__w"),
    )
    return chunks.select(
        "id",
        "chunk_idx",
        "start_tok",
        F.size("__w").alias("n_tokens"),
        F.array_join("__w", " ").alias("chunk_text"),
    ).filter(F.col("n_tokens") >= min_tokens)


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col: str | None = None,
    text_col: str = "text",
    seed: str = "mix|",
    hash_fn: str = "portable",
) -> DataFrame:
    """Select a training mix: from each source, take documents in
    deterministic hash order until that source's token quota
    (``round(weights[source] * token_budget)``) is filled.

    This is the data-mixing pass of an LLM pipeline — "20% code, 30%
    web, ..." — made reproducible: a document is selected iff the
    running token total of the docs hashed before it (within its
    source) is still under the quota, so the chosen set is a pure
    function of (seed, ids, token counts) and an ANSI-SQL engine
    replays it exactly. The quota-filling doc itself is included
    (budgets are met-or-slightly-exceeded, never under-filled while
    source data remains); sources absent from ``weights`` contribute
    nothing.

    Returns (id, source, n_tokens, cum_before, quota) for the selected
    documents. ``tokens_col`` supplies precomputed counts; default
    counts whitespace tokens of ``text_col``.

    Scale shape: same two-level prefix sum as :func:`pack_sequences`,
    keyed per (source, hash-bucket) — the per-source running totals
    parallelize across buckets because the hash order is uniform, and
    only the (sources x buckets)-row offset table is sequential
    (broadcast back). No single-partition window at any corpus size.
    """
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    if not weights:
        raise ValueError("weights must name at least one source")
    n_tok = (
        F.size(F.split(F.col(text_col), " ")).cast("long")
        if tokens_col is None
        else F.col(tokens_col).cast("long")
    )
    key = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    qpairs = []
    for s, w in weights.items():
        qpairs.extend([F.lit(s), F.lit(int(round(w * token_budget)))])
    qmap = F.create_map(*qpairs)
    keyed = (
        docs.filter(F.col(source_col).isin(*list(weights)))
        .select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("source"),
            n_tok.alias("n_tokens"),
            key.alias("__k"),
        )
    )
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    bits = max(1, (4 * par - 1).bit_length())
    keyed = keyed.withColumn("__b", F.shiftrightunsigned(F.col("__k"), 60 - bits))
    # ROWS frame + n_tokens tiebreak: see pack_sequences — the default
    # RANGE frame double-counts peer rows (duplicate ids) and diverges
    # from the oracle's pinned ROWS frame.
    in_bucket = F.sum("n_tokens").over(
        W.partitionBy("source", "__b")
        .orderBy("__k", "id", "n_tokens")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = (
        keyed.groupBy("source", "__b")
        .agg(F.sum("n_tokens").alias("__t"))
        .select(
            "source",
            "__b",
            (
                F.sum("__t").over(
                    W.partitionBy("source")
                    .orderBy("__b")
                    .rowsBetween(W.unboundedPreceding, W.currentRow)
                )
                - F.col("__t")
            ).alias("__off"),
        )
    )
    return (
        keyed.withColumn("__cum", in_bucket)
        .join(F.broadcast(offsets), ["source", "__b"])
        .select(
            "id",
            "source",
            "n_tokens",
            (F.col("__off") + F.col("__cum") - F.col("n_tokens")).alias("cum_before"),
            qmap[F.col("source")].cast("long").alias("quota"),
        )
        .filter(F.col("cum_before") < F.col("quota"))
    )
