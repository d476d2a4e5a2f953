"""Deterministic sampling operators for training-data curation.

Quota/stratified sampling is the workhorse of dataset mixing ("take
200k documents per language", "cap every domain at 10k pages"). The
implementations here are hash-ordered rather than RNG-ordered: each
row's rank within its stratum is a pure function of its id, so the
sample is reproducible across runs, cluster sizes, and engines — and
the DuckDB oracle can re-derive it bit-for-bit via the portable md5-60
hash (signal_collect_spark.data.hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    *,
    id_col: str = "doc_id",
    seed: str = "strat|",
    hash_fn: str = "portable",
) -> DataFrame:
    """Up to ``n_per_stratum`` rows per distinct ``strata_col`` value,
    chosen as the smallest hash values of ``seed || id`` — a
    deterministic uniform sample (md5 is uniform over ids; change
    ``seed`` to draw an independent sample).

    Returns the input columns + ``sample_rank`` (1-based hash-order
    rank within the stratum).

    Shape: one hash projection + one window. row_number over
    (stratum, hash) would normally mean a full sort of every stratum,
    but Spark's WindowGroupLimit optimization (3.5+) pushes the
    rank <= n filter below the shuffle — each map partition ships only
    its local top-n per stratum, so a 10^9-row stratum moves
    O(n × partitions) rows, not 10^9 (the same physics as the
    engine's TopK aggregation). Skewed strata therefore do NOT need
    salting here; the pre-shuffle cap bounds the hot key.
    """
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    h = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = W.partitionBy(strata_col).orderBy(F.col("__h"), F.col(id_col))
    return (
        docs.withColumn("__h", h)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("__h")
    )


def hash_fraction_sample(
    docs: DataFrame,
    fraction: float,
    *,
    id_col: str = "doc_id",
    seed: str = "frac|",
    hash_fn: str = "portable",
) -> DataFrame:
    """Deterministic ~``fraction`` Bernoulli sample: keep rows whose
    60-bit hash of ``seed || id`` falls below fraction·2^60. Unlike
    ``DataFrame.sample`` this is stable across runs/partitionings and
    reproducible by the SQL oracle; a pure filter — no shuffle, no
    state, fully pushed into the scan stage.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    h = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    threshold = int(fraction * (1 << 60))
    return docs.filter(h < F.lit(threshold))


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    *,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    seed: str = "wsamp|",
    hash_fn: str = "portable",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis,
    IPL 2006, algorithm A-ES): keep the ``k`` rows with the largest
    key u^(1/w), where u is a deterministic uniform in (0, 1] derived
    from the portable 60-bit hash of ``seed || id`` and w the row's
    weight — each subset's selection probability is exactly the
    sequential weighted draw's. Per ``strata_col`` group when given
    (e.g. "sample 10k docs per language, weighted by quality score").

    Rows with weight <= 0 or NULL are excluded (they'd get key 0
    anyway). Returns the input columns + ``sample_rank`` (1-based,
    descending key). Determinism across engines: the key is ROUNDED to
    12 decimals before ranking (pow/log are not correctly-rounded
    across libm implementations — the kmeans 6-dp pinning lesson),
    with (hash, id) as the total tie-break, so the DuckDB oracle
    re-derives the identical sample.

    Shape: one hash projection + one window; WindowGroupLimit pushes
    the rank <= k cap below the shuffle exactly as in
    :func:`stratified_sample`, so hot strata ship O(k x partitions)
    rows, not their full size.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 12
    )
    w = (
        W.partitionBy(strata_col) if strata_col is not None else W.partitionBy()
    ).orderBy(F.col("__key").desc(), F.col("__h"), F.col(id_col))
    out = (
        docs.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__h", h)
        .withColumn("__key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__h", "__key")
    )
    return out
