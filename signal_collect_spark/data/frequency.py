"""Frequency-sketch operators: exact heavy hitters via a distributed
Misra-Gries candidate pass.

The naive "which tokens exceed phi = 1/m of the corpus" query shuffles
EVERY distinct token to a reducer (groupBy token over the full corpus
— at 100 TB that is a trillion-row shuffle dominated by the long tail
that can never be a heavy hitter).  The classical fix (Misra & Gries
1982; mergeable-summaries form: Agarwal et al., PODS 2012) bounds the
shuffle by the sketch size instead:

  phase 1  — each partition folds its tokens into an m-counter
             Misra-Gries summary inside ``mapInPandas`` (vectorized:
             per-Arrow-batch ``value_counts`` merged into the sketch by
             the add-then-subtract-(m+1)-th-largest rule, which is the
             PODS'12 MERGE operation, error <= N_p/(m+1));
  phase 2  — the union of per-partition survivors (at most m rows per
             partition) is broadcast back as a semi-join filter, and
             only candidate tokens are recounted exactly.

Guarantee: any token with global frequency F > N/(m+1) has positive
estimate in at least one partition summary (sum of per-partition
errors <= N/(m+1)), so the candidate set is a superset of every true
heavy hitter at threshold N/m > N/(m+1).  The final output is EXACT
counts — the sketch only prunes the shuffle, it never decides.

Output: (token, n_occurrences) for every token with
n_occurrences > N/m, where N = total token count.  Deterministic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(m: int):
    """Per-partition Misra-Gries fold; yields the surviving candidate
    tokens (sketch keys with positive residual estimate)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf["token"].value_counts()
            sketch = sketch.add(counts, fill_value=0)
            if len(sketch) > m:
                # PODS'12 merge: subtract the (m+1)-th largest counter
                # from all counters, drop the non-positive ones.
                cut = sketch.nlargest(m + 1).iloc[-1]
                sketch = sketch - cut
                sketch = sketch[sketch > 0]
        yield pd.DataFrame({"token": sketch.index.astype(str)})

    return fold


def heavy_hitters(
    docs: DataFrame,
    m: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact tokens with frequency > N/m, shuffle bounded by the
    Misra-Gries candidate set (<= m rows per input partition)."""
    tokens = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .where(F.col("token") != "")
        .persist()
    )
    n_total = tokens.count()

    candidates = (
        tokens.mapInPandas(_mg_partition(m), schema="token string")
        .distinct()
    )
    out = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .where(F.col("n_occurrences") > n_total / m)
    )
    rows = out.collect()  # tiny: < m rows by the MG bound
    tokens.unpersist()
    spark = docs.sparkSession
    if not rows:
        return spark.createDataFrame([], "token string, n_occurrences long")
    return spark.createDataFrame(rows, out.schema)
