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
