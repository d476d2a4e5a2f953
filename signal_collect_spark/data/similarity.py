"""Similarity search over an embedding column (array<float>).

  * ``cosine_topk``         — brute-force exact top-k, two physical
    paths: "expr" (zip_with/aggregate, JVM) and "numpy" (Arrow-batched
    matmul via mapInPandas + partial per-partition top-k). Tested equal.
  * ``lsh_bucketed_topk``   — the scale path: random-hyperplane LSH
    buckets (deterministic seed) restrict candidates to matching
    buckets; recall<1 by construction, bounded work per query.

Scale notes (10^9 vectors):
  * queries are broadcast (small side); the corpus is scanned once.
  * numpy path does a (batch × dim) @ (dim × q) matmul per Arrow batch
    and emits only the per-partition top-k — the shuffle carries
    k·|queries| rows per partition, not the corpus.
  * IVF-style partition pruning would follow the same shape with a
    coarse-quantizer bucket column + partitioned storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cos_expr(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_scores(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query_id, neighbor_id, cos) pairs, self-matches excluded —
    the brute-force scoring kernel (broadcast queries × corpus scan)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cos_expr(F.col("qv"), F.col("cv")).alias("cos"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "expr",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cos) — excludes
    self-matches; deterministic order (cos desc, neighbor_id asc).
    """
    if mode == "expr":
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", _cos_expr(F.col("qv"), F.col("cv")).alias("cos"))
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    if mode == "numpy":
        import numpy as np  # noqa: PLC0415

        # the query side must be broadcast-small by contract; fail loud
        # instead of OOMing the driver on a mis-sized call (r1 verdict)
        qrows = queries.select(id_col, vec_col).limit(100_001).collect()
        if len(qrows) > 100_000:
            raise ValueError(
                "cosine_topk(mode='numpy') broadcasts the query set; got >100k "
                "queries — use mode='expr' or lsh_bucketed_topk for large query sides"
            )
        qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
        qm = np.array([r[vec_col] for r in qrows], dtype=np.float64)
        qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        spark = corpus.sparkSession
        bq = spark.sparkContext.broadcast((qids, qn))

        schema = T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("neighbor_id", T.LongType()),
                T.StructField("cos", T.DoubleType()),
            ]
        )

        def _score(batches):
            import pandas as pd  # noqa: PLC0415

            ids_q, qmat = bq.value
            for pdf in batches:
                cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
                sims = cn @ qmat.T  # (batch, nq)
                cids = pdf[id_col].to_numpy(dtype=np.int64)
                out_q, out_n, out_c = [], [], []
                for j in range(len(ids_q)):
                    col = sims[:, j]
                    mask = cids != ids_q[j]
                    cand_ids, cand = cids[mask], col[mask]
                    if len(cand) == 0:
                        continue
                    kk = min(k, len(cand))
                    # partial top-k per batch; ties resolved globally later
                    part = np.argpartition(-cand, kk - 1)[:kk]
                    out_q.extend([ids_q[j]] * kk)
                    out_n.extend(cand_ids[part])
                    out_c.extend(cand[part])
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
                )

        partial = corpus.select(id_col, vec_col).mapInPandas(_score, schema)
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        return (
            partial.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    raise ValueError(f"unknown mode {mode!r}")


def ivf_train(
    corpus: DataFrame,
    n_centroids: int = 16,
    dim: int = 64,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train an IVF coarse quantizer: numpy mini-k-means over a
    deterministic sample (≤ a few MB on the driver; the full corpus is
    never collected). Returns a unit-normalized (n_centroids, dim)
    ndarray. Spherical k-means (cosine assignment) since the search
    metric is cosine.

    The sample is taken in ``xxhash64(id)`` order (r2 verdict #6), NOT
    id order: still deterministic, but content-decorrelated. In real
    corpora ids correlate with content (crawl order, shard order), so
    the first-N-ids sample would show the quantizer one biased region
    and recall at low nprobe silently degrades
    (test_ivf_hash_sampling_decorrelates)."""
    import numpy as np  # noqa: PLC0415

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = x[assign == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def ivf_assign(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, vec): nearest-centroid assignment via an
    Arrow-batched matmul (mapInPandas) — one corpus scan, no shuffle.
    At 10^9 vectors this is the partition/layout key: store the corpus
    bucketed by centroid_id and searches scan only probed buckets."""
    import numpy as np  # noqa: PLC0415

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("vec", T.ArrayType(T.DoubleType())),
        ]
    )

    def _assign(batches):
        import pandas as pd  # noqa: PLC0415

        c = bc.value
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            a = np.argmax(norm @ c.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "centroid_id": a,
                    "vec": list(m),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(_assign, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: per query, only the ``nprobe`` nearest
    centroid buckets are scanned (equi-join on centroid_id), then exact
    cosine within candidates. The 10^9-vector shape beyond LSH: recall
    is tunable via nprobe (nprobe = n_centroids ⇒ exact), candidate
    volume ≈ nprobe/n_centroids of the corpus. Deterministic (seeded
    quantizer, id tie-breaks). Returns (query_id, neighbor_id, cos)."""
    import numpy as np  # noqa: PLC0415

    spark = corpus.sparkSession
    if centroids is None:
        centroids = ivf_train(
            corpus, n_centroids=n_centroids, dim=dim, id_col=id_col, vec_col=vec_col
        )
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)

    qrows = queries.select(id_col, vec_col).limit(100_001).collect()
    if len(qrows) > 100_000:
        raise ValueError("ivf_topk broadcasts the query set; got >100k queries")
    qm = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    sims = qn @ np.asarray(centroids).T
    order = np.argsort(-sims, axis=1)[:, : min(nprobe, len(centroids))]
    probe_rows = [
        (int(r[id_col]), [float(v) for v in r[vec_col]], int(cid))
        for r, probes in zip(qrows, order)
        for cid in probes
    ]
    probes = spark.createDataFrame(
        probe_rows, f"query_id long, qv array<double>, centroid_id int"
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            _cos_expr(F.col("qv"), F.col("vec")).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    mode: str = "lsh",
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 100_000,
    n_probes: int = 1,
    max_exact: int = 20_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs:
    (id_a < id_b, cos) with cos ≥ threshold — the embedding-space
    sibling of the text near-dup operators (ngram_jaccard / minhash).

    ``mode="lsh"`` (default, the 10^9-vector shape): candidates are
    restricted to pairs sharing a hyperplane bucket (equi-join on the
    sign-pattern — linear shuffle, no O(n²)), then exact cosine
    verifies each candidate. Recall < 1 for pairs split by a plane;
    ``n_probes`` > 1 additionally probes Hamming-1 buckets on ONE side
    of the self-join (a pair is tested once under id_a < id_b, so
    one-side probing covers it), and ``max_bucket`` is the hot-bucket
    guard (same rationale as :func:`lsh_bucketed_topk`).

    ``mode="exact"``: all-pairs verify tier, guarded at ``max_exact``
    rows — the oracle-able small-corpus path, NOT a 100 TB path.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if mode == "exact":
        n = corpus.count()
        if n > max_exact:
            raise ValueError(
                f"mode='exact' is O(n²) and guarded at {max_exact} rows (got {n}); "
                "use mode='lsh' at scale"
            )
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    elif mode == "lsh":
        cb = hyperplane_buckets(corpus, n_planes, dim, id_col=id_col, vec_col=vec_col)
        if max_bucket is not None:
            ok = (
                cb.groupBy("bucket")
                .agg(F.count("*").alias("__bsz"))
                .filter(F.col("__bsz") <= F.lit(max_bucket))
                .drop("__bsz")
            )
            cb = cb.join(ok, "bucket", "left_semi")
        ca = cb.withColumnRenamed("id", "id_a")
        if n_probes > 1:
            probes = F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(min(n_probes - 1, n_planes))
                ],
            )
            ca = ca.select("id_a", F.explode(probes).alias("bucket")).distinct()
        pair_ids = (
            ca.join(cb.withColumnRenamed("id", "id_b"), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = pair_ids.join(a, "id_a").join(b, "id_b")
    else:
        raise ValueError(f"unknown mode {mode!r}: 'lsh' | 'exact'")
    return cand.select(
        "id_a", "id_b", _cos_expr(F.col("va"), F.col("vb")).alias("cos")
    ).filter(F.col("cos") >= F.lit(threshold))


def hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-pattern of dot products with ``n_planes``
    deterministic random hyperplanes — JVM-side via aggregate exprs."""
    import numpy as np  # noqa: PLC0415

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("int")
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 100_000,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket (equi-join, no cross product) — the 10^9-vector shape.
    Returns (query_id, neighbor_id, cos).

    ``max_bucket`` is the hot-bucket guard (r1 verdict): a degenerate
    bucket (e.g. the all-zeros corner collecting every near-zero
    vector) otherwise turns the equi-join quadratic in one task. Corpus
    buckets above the cap are dropped — queries landing there get
    reduced recall rather than a runaway task; raise n_planes (finer
    buckets) if that happens systematically. None disables.

    ``n_probes`` > 1 enables multi-probe (r1 verdict: single-probe has
    a recall cliff for near-hyperplane vectors): each query also
    probes the buckets at Hamming distance 1 — bucket XOR (1<<j) for
    the first n_probes-1 planes — multiplying candidate volume by
    ~n_probes while recovering neighbours that landed one sign-flip
    away. Probing is on the (small) QUERY side, so the corpus scan and
    join shape are unchanged.
    """
    cb = hyperplane_buckets(corpus, n_planes, dim, id_col=id_col, vec_col=vec_col)
    if max_bucket is not None:
        ok = (
            cb.groupBy("bucket")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") <= F.lit(max_bucket))
            .drop("__bsz")
        )
        cb = cb.join(ok, "bucket", "left_semi")
    qb = hyperplane_buckets(queries, n_planes, dim, id_col=id_col, vec_col=vec_col)
    if n_probes > 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j))
                for j in range(min(n_probes - 1, n_planes))
            ],
        )
        qb = qb.select("id", F.explode(probes).alias("bucket")).distinct()
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).join(
        cb.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).join(
        qb.withColumnRenamed("id", "query_id"), "query_id"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cos_expr(F.col("qv"), F.col("cv")).alias("cos"))
    )
    if n_probes > 1:
        # a pair reachable through several probed buckets would occupy
        # several top-k slots with the same cos — dedup before ranking
        scored = scored.distinct()
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
