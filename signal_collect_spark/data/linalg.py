"""Distributed dense linear algebra over the embedding column.

The Gram matrix G = X^T X (d x d over n vectors) is the building block
for corpus-scale PCA / whitening / covariance estimation: compute G
distributed (one pass, d(d+1)/2 running sums), eigendecompose the tiny
d x d result on the driver, broadcast the projection back. Spark ML's
RowMatrix has a JVM version; this is the DataFrame-native equivalent
with two execution tiers and a value-level SQL oracle.

Tiers:
- ``mode="expr"`` — explode each vector into its (i, j, x_i*x_j)
  upper-triangle pairs and run ONE map-side-combined keyed sum. Pure
  JVM expressions, oracle-replayable; shuffles d(d+1)/2 rows per
  PARTITION after partial aggregation (not per vector — the combine
  collapses each partition to one partial G).
- ``mode="numpy"`` — Arrow-batched mapInPandas computes each batch's
  partial gram with one BLAS ``X.T @ X`` and emits d(d+1)/2 rows per
  BATCH; the same keyed sum merges partials. ~d times less explode
  traffic and BLAS-speed multiply — the 100 TB path (the ANN scoring
  precedent: similarity.py cosine_topk mode="numpy").

Both tiers produce identical results (tested) because per-element
products are IEEE-identical and the final per-key sum is rounded to
6 dp, absorbing partial-order reassociation exactly as the kmeans
centroid pinning does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_gram(
    corpus: DataFrame,
    dim: int = 64,
    *,
    vec_col: str = "embedding",
    mode: str = "expr",
) -> DataFrame:
    """Upper-triangle Gram matrix of the ``vec_col`` vectors:
    (i, j, g) for 0 <= i <= j < dim with g = ROUND(Σ_rows x_i·x_j, 6).
    """
    if mode == "expr":
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        pairs = F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(dim - 1)),
                    lambda j: F.struct(
                        i.cast("int").alias("i"),
                        j.cast("int").alias("j"),
                        (F.element_at(v, i + 1) * F.element_at(v, j + 1)).alias("p"),
                    ),
                ),
            )
        )
        exploded = corpus.select(F.explode(pairs).alias("t")).select(
            F.col("t.i").alias("i"), F.col("t.j").alias("j"), F.col("t.p").alias("p")
        )
        return (
            exploded.groupBy("i", "j")
            .agg(F.round(F.sum("p"), 6).alias("g"))
        )
    if mode == "numpy":
        import pandas as pd  # noqa: PLC0415

        iu_i, iu_j = zip(
            *[(i, j) for i in range(dim) for j in range(i, dim)], strict=True
        )

        def partial_gram(batches):
            import numpy as np  # noqa: PLC0415

            for pdf in batches:
                X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                G = X.T @ X
                yield pd.DataFrame(
                    {"i": iu_i, "j": iu_j, "p": G[list(iu_i), list(iu_j)]}
                )

        partials = corpus.select(vec_col).mapInPandas(
            partial_gram, schema="i int, j int, p double"
        )
        return partials.groupBy("i", "j").agg(F.round(F.sum("p"), 6).alias("g"))
    raise ValueError(f"unknown mode {mode!r}: 'expr' | 'numpy'")
