"""Distributed k-means (Lloyd) over an embedding column.

Unlike :func:`signal_collect_spark.data.similarity.ivf_train` (which
mini-k-means a bounded DRIVER sample to seed the IVF quantizer), this
is full distributed Lloyd: every iteration assigns EVERY corpus vector
to its nearest centroid with JVM-side expressions (one left-fold
squared-L2 per centroid — no Python in the scan) and recomputes
centroids as distributed per-(cluster, position) means. Only the
(k x dim) centroid table ever reaches the driver (the standard
broadcast-parameter pattern — k*dim doubles, bytes not gigabytes).

Everything is pinned for cross-engine replay: init centroids are the
first k vectors in portable md5-60 hash order (deterministic,
content-decorrelated), distances are strict left folds over the
float32-exact components, ties pick the lowest centroid index, and
centroid components are ROUNDED to 6 dp after each mean — so the
aggregation-order float noise (~1e-13) in the means cannot leak into
the next iteration's literals, and an ANSI-SQL engine running the same
rounded iterations reproduces every assignment (the DuckDB oracle in
`__spark_entry__.py` does exactly this).

Scale shape per iteration: one scan + map-side-combined
groupBy(cluster, pos) over k*dim groups. No shuffle of the vectors
themselves beyond the posexplode aggregate; assignment is
embarrassingly parallel. The reference has no clustering surface —
this extends its aggregation family to the embeddings table the same
way the ANN operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.data.hashing import hash_fn_column
from signal_collect_spark.data.similarity import _cos_expr


def _dist_expr(vec_col, centroid: list[float]):
    """Left-fold squared L2 between the vector column and a centroid
    literal — identical fold order to the SQL oracle's list_reduce."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(base: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(id, vec, cluster) — nearest centroid per vector, lowest index on
    exact ties.

    Physical shape: broadcast the (k x dim) centroid TABLE and take a
    keyed min over the k per-pair distances, instead of one giant
    expression with k*dim literals baked in. The literal form rebuilt
    and re-analyzed a ~k*dim-node tree EVERY Lloyd iteration (new
    centroid constants each time -> zero plan reuse), which profiling
    put at most of kmeans' wall. Math is unchanged: the squared-L2 fold
    is the same zip_with/aggregate left fold (now over two array
    COLUMNS), and min(struct(dist, cidx)) picks the smallest distance
    with ties to the lowest index — exactly array_position(array_min)
    on the literal vector. Distances are float64-identical, so
    assignments (and the SQL-oracle replay) are bit-identical.
    """
    spark = base.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cidx int, cent array<double>",
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("vec"), F.col("cent"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        base.crossJoin(F.broadcast(cent_df))
        .groupBy("id")
        .agg(
            F.min(F.struct(dist.alias("d"), F.col("cidx").alias("cidx"))).alias("__m"),
            F.first("vec").alias("vec"),
        )
        .select("id", "vec", F.col("__m.cidx").alias("cluster"))
    )


def kmeans(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "km|",
    hash_fn: str = "portable",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds; returns
    (id, cluster) — cluster = 0..k-1 index of the nearest centroid
    after the final update, lowest index on exact ties.

    ``iters`` is fixed rather than convergence-driven so the result is
    a pure function of the input (and SQL-replayable); callers wanting
    convergence loop externally and compare the rounded centroid
    tables between iterations.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = corpus.sparkSession
    key = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    base = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), key.alias("__k")
    ).persist()
    try:
        seeds = base.orderBy("__k", "id").limit(k).select("vec").collect()
        cents = [[float(x) for x in r["vec"]] for r in seeds]
        if len(cents) < k:
            raise ValueError(f"kmeans: corpus has fewer than k={k} vectors")

        assigned = None
        for _ in range(iters):
            assigned = _assign(base, cents)
            means = (
                assigned.select("cluster", F.posexplode("vec").alias("pos", "x"))
                .groupBy("cluster", "pos")
                .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                .select("cluster", F.transform("pm", lambda s: s["m"]).alias("c"))
                .collect()
            )
            new_cents = list(cents)
            for r in means:  # empty clusters keep their previous centroid
                new_cents[r["cluster"]] = [float(x) for x in r["c"]]
            cents = new_cents
        # final assignment against the post-update centroids
        out = _assign(base, cents).select("id", "cluster")
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        base.unpersist()


def semantic_dedup(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "portable",
    seed: str = "sd|",
    max_cluster: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by
    clustering the embedding space with k-means, then dropping every
    vector that has an EARLIER same-cluster vector within cosine
    ``threshold``. Returns (id, cluster, kept) for the whole corpus.

    "Earlier" is the deterministic portable-hash order (hash of
    ``seed || id``, ties by id) — content-decorrelated, so the survivor
    of each duplicate group is an unbiased pick, and the rule needs no
    transitive closure: x is dropped iff SOME earlier y in its cluster
    has cos(x, y) >= threshold. This is the paper's keep-one-per-
    duplicate-group semantics restated as a pairwise domination test,
    which makes it a pure function of the input (SQL-replayable — the
    DuckDB oracle in `__spark_entry__.py` replays the identical
    k-means iterations and domination join).

    Scale shape: the whole point of SemDeDup is replacing the O(n²)
    all-pairs cosine with O(Σ_c n_c²) within-cluster pairs — k grows
    with the corpus so n_c stays bounded. Here that is ONE equi-join
    on cluster id (shuffle keyed on cluster, no broadcast of the
    corpus), cosine as a JVM left-fold expression, and a left-semi +
    left-anti pair against the drop set. ``max_cluster`` (default
    100k) is the loud guard: a cluster bigger than that means k is too
    small for the corpus and the quadratic term is back — raise k.
    """
    assign = kmeans(
        corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col, hash_fn=hash_fn
    )
    key = hash_fn_column(hash_fn, F.concat(F.lit(seed), F.col(id_col).cast("string")))
    vecs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), key.alias("hk")
    )
    # materialized once: j feeds the max_cluster probe AND both sides of
    # the within-cluster pair join — lazily chained it re-ran the
    # assignment join three times
    j = assign.join(vecs, "id").localCheckpoint(eager=True)
    if max_cluster is not None:
        biggest = j.groupBy("cluster").count().agg(F.max("count")).first()[0]
        if biggest is not None and biggest > max_cluster:
            raise ValueError(
                f"semantic_dedup: largest cluster has {biggest} vectors "
                f"(max_cluster={max_cluster}); the within-cluster pair join "
                "would be quadratic in that — increase k"
            )
    x = j.select(
        F.col("id").alias("id_x"), F.col("cluster").alias("cl"),
        F.col("vec").alias("vx"), F.col("hk").alias("hx"),
    )
    y = j.select(
        F.col("id").alias("id_y"), F.col("cluster").alias("cl"),
        F.col("vec").alias("vy"), F.col("hk").alias("hy"),
    )
    earlier = (F.col("hy") < F.col("hx")) | (
        (F.col("hy") == F.col("hx")) & (F.col("id_y") < F.col("id_x"))
    )
    dropped = (
        x.join(y, "cl")
        .filter(earlier & (_cos_expr(F.col("vx"), F.col("vy")) >= F.lit(threshold)))
        .select(F.col("id_x").alias("id"))
        .distinct()
    )
    return assign.join(
        dropped.select("id", F.lit(False).alias("__kept")), "id", "left"
    ).select("id", "cluster", F.coalesce("__kept", F.lit(True)).alias("kept"))
