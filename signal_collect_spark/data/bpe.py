"""Distributed BPE vocabulary induction (Sennrich et al., ACL 2016) —
the merge-table learning step of a byte-pair-encoding tokenizer, run
as a vocabulary-level Spark job.

The key scale observation: BPE training never needs the corpus after
the first pass.  One scan builds the (word, frequency) table; every
merge round after that operates on the DISTINCT-WORD table (vocab-size
rows — millions, not trillions), so a 100 TB corpus pays one
tokenize+groupBy shuffle and then iterates over a table that fits a
few executors.  Within a round:

  * pair counting  — explode adjacent token pairs per word, weighted by
    word frequency; groupBy(a, b) with map-side partial aggregation
    (the pair space is tiny relative to the vocab);
  * argmax         — orderBy(count DESC, a, b).limit(1) compiles to
    TakeOrdered, not a full sort;
  * merge apply    — a single literal ``replace`` per word over a
    leading-separator token encoding (see below), whole-stage codegen,
    zero Python.

Token encoding: a word's tokenization is packed as one string with a
U+001F (unit separator) BEFORE each token — ``"ab"+"c"`` is
``"\\x1fab\\x1fc"``.  Applying merge (a, b) -> ab is then exactly
``replace(s, SEP+a+SEP+b, SEP+a+b)``: because every token carries its
own leading separator and ``replace`` scans left-to-right over
non-overlapping matches, this reproduces BPE's greedy left-to-right
merge application (e.g. merge (a,a) on "aaaa" -> "aa","aa"), and a
pattern can never match inside a token.  Input text is assumed not to
contain U+001F (true of any sane corpus; assert cheaply upstream if
unsure).

Pair counts follow the reference formulation (all adjacent index
pairs, overlapping — "aaaa" contributes 3 to (a,a)); ties on count
break lexicographically on (a, b) so the merge table is deterministic.

Returns the learned merge table: one row per round,
(merge_round, left_tok, right_tok, merged, pair_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEP = "\x1f"

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("merge_round", T.IntegerType(), False),
        T.StructField("left_tok", T.StringType(), False),
        T.StructField("right_tok", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over whitespace-pre-tokenized text.

    One corpus scan -> (word, freq); then ``n_merges`` rounds over the
    distinct-word table only.  Stops early if no adjacent pair remains.

    Input assumption (in addition to the documented U+001F one): words
    are whitespace-split surface tokens containing no line terminators.
    The char-encoding regex ``(.)`` deliberately does not match \\n/\\r
    (Java regex and the oracle's RE2 agree, so parity holds); a word
    that somehow contained one would get that character fused onto the
    preceding token at round 0 instead of standing alone.
    """
    spark: SparkSession = docs.sparkSession

    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        # leading-separator char encoding: "abc" -> "\x1fa\x1fb\x1fc"
        .select(
            F.regexp_replace(F.col("word"), "(.)", SEP + "$1").alias("s"),
            F.col("c"),
        )
        .persist()
    )
    words.count()

    merges: list[tuple[int, str, str, str, int]] = []
    cur = words
    for r in range(1, n_merges + 1):
        pairs = (
            cur.withColumn(
                "toks", F.filter(F.split(F.col("s"), SEP), lambda t: t != F.lit(""))
            )
            .where(F.size("toks") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> struct(toks[i-1] AS a, toks[i] AS b))"
                    )
                ).alias("p"),
                "c",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("c").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((r, a, b, a + b, int(cnt)))
        cur = cur.withColumn(
            "s", F.replace(F.col("s"), F.lit(SEP + a + SEP + b), F.lit(SEP + a + b))
        )

    words.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to a corpus; returns
    (id, n_tokens_char, n_tokens_bpe) — the compression the vocabulary
    buys.  Pure expression chain (one replace per merge rule), so the
    full pass stays inside whole-stage codegen at any corpus size."""
    # char-level encoding over the whole text at once: a separator
    # before every non-space char; spaces stay as word delimiters, so a
    # merge pattern (which always starts with SEP) can never straddle a
    # word boundary.
    s = F.regexp_replace(
        F.regexp_replace(F.col(text_col), "(.)", SEP + "$1"),
        SEP + " ",
        " ",
    )
    for a, b in merges:
        s = F.replace(s, F.lit(SEP + a + SEP + b), F.lit(SEP + a + b))
    n_char = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    n_bpe = F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))
    return docs.select(
        F.col(id_col).alias("id"),
        n_char.alias("n_tokens_char"),
        n_bpe.alias("n_tokens_bpe"),
    )
