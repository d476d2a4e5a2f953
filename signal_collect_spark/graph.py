"""Graph construction: vertex/edge tables, degrees, normalization, CSR packing.

The reference keeps a mutable vertex-partitioned property graph in
worker-local hash maps (storage/VertexMap.scala:35-47) with edges
attached to their source vertex (AbstractVertex.scala:41) and routes
signals by hash(id) % numberOfWorkers
(messaging/DefaultVertexToWorkerMapper.scala:28-35).

Spark-native equivalents:
  * ``edges``   DataFrame (src: long, dst: long, weight: double),
    hash-partitioned by src — co-located with the signalling frontier.
  * ``vertices`` derived as distinct(src) ∪ distinct(dst) — mirrors the
    auto-create-on-addEdge handler (interfaces/Handlers.scala:52-63).
  * ``sum_of_out_weights`` per source (≙ SumOfOutWeights.scala:22-48)
    pre-folded into a ``norm_weight`` column so the per-edge signal of
    PageRankEdge (examples/PageRank.scala:39: state*weight/sumOfOutWeights)
    becomes a single multiply at superstep time.
  * CSR packing per partition (≙ the compact adjacency encodings in
    util/Ints.scala:44-60 / SplayIntSet) as sorted parallel arrays for
    the Arrow/numpy SpMV execution mode.

Scale notes (100 TB / 10^9+ edges):
  * everything here is a single shuffle on src (or dst for in-degrees);
    no collects, no driver-side loops.
  * partition count is explicit so the iterative engine re-uses one
    partitioning across all supersteps (no re-shuffle per iteration).
  * hub skew: out-degree skew concentrates rows of one src in one task.
    ``salt_edges`` splits a hub's adjacency across ``n_salts``
    sub-groups; sum/min aggregation is associative so two-phase
    aggregation stays exact (the reference has no skew handling at all —
    its per-worker hash map simply grows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def edges_from_pairs(
    spark: SparkSession, pairs: list[tuple[int, int]] | list[tuple[int, int, float]]
) -> DataFrame:
    """Small fixture helper: build an edge DataFrame from (src, dst[, weight])."""
    rows = [(int(p[0]), int(p[1]), float(p[2]) if len(p) > 2 else 1.0) for p in pairs]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """vertices = distinct src ∪ distinct dst (id: long).

    Mirrors vertex auto-creation from an edge stream
    (interfaces/Handlers.scala:52-63 / loading semantics).
    """
    return (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: e ∪ reverse(e), deduplicated.

    The reference builds undirected graphs by adding both directed edges
    explicitly (e.g. IntegrationSpec.scala:238-295 grid/torus generators).
    """
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
    )
    return edges.unionAll(rev).groupBy("src", "dst").agg(F.max("weight").alias("weight"))


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, sum_out_weights) per source vertex.

    sum_out_weights ≙ the SumOfOutWeights vertex mixin
    (SumOfOutWeights.scala:22-48) maintained incrementally in the
    reference; here one partial/final aggregate.
    """
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree"),
        F.sum("weight").alias("sum_out_weights"),
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))


def normalize_edges(edges: DataFrame) -> DataFrame:
    """Add ``norm_weight = weight / sum_out_weights(src)``.

    Pre-computes the constant part of the PageRank signal
    (examples/PageRank.scala:39) so supersteps avoid a per-iteration
    join against the degree table. One shuffle, done once.
    """
    w = out_degrees(edges).select("id", "sum_out_weights")
    # no blind force-broadcast: AQE converts this to a broadcast join at
    # runtime when the degree table's actual size is under the threshold
    return edges.join(w, edges.src == w.id, "inner").select(
        "src",
        "dst",
        "weight",
        (F.col("weight") / F.col("sum_out_weights")).alias("norm_weight"),
    )


def partition_edges(edges: DataFrame, num_partitions: int) -> DataFrame:
    """Hash-partition edges by src once; the superstep loop reuses this
    partitioning every iteration (frontier is repartitioned to match),
    so the signal join is co-located and only the inbox aggregate
    shuffles. ≙ DefaultVertexToWorkerMapper.scala:28-35.
    """
    return edges.repartition(num_partitions, "src")


def salt_edges(edges: DataFrame, hub_threshold: int = 100_000, n_salts: int = 16) -> DataFrame:
    """Split hub sources' adjacency lists across salt buckets.

    Adds a ``salt`` column: 0 for normal vertices; pmod(xxhash64(dst), n)
    for sources whose out-degree exceeds ``hub_threshold``. The engine's
    aggregations are associative (sum/min) so correctness is unchanged;
    at cluster scale this prevents a single task from owning a hub's
    entire adjacency. (No reference equivalent — reference has no skew
    handling; required by the north rule.)
    """
    deg = out_degrees(edges).select("id", "out_degree")
    e = edges.join(deg.hint("broadcast"), edges.src == deg.id, "left").drop("id")
    return e.withColumn(
        "salt",
        F.when(
            F.col("out_degree") > F.lit(hub_threshold),
            F.pmod(F.xxhash64("dst"), F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("out_degree")


# ---------------------------------------------------------------------------
# CSR packing for the Arrow/numpy SpMV execution mode
# ---------------------------------------------------------------------------

CSR_SCHEMA = (
    "pid int, srcs array<long>, dsts array<long>, weights array<double>"
)


def csr_pack(
    edges: DataFrame,
    num_partitions: int,
    weight_col: str = "weight",
    n_salts: int = 1,
    max_chunk_edges: int = 4_000_000,
) -> DataFrame:
    """Pack edges into sorted CSR-ish chunk rows per hash partition.

    ≙ the reference's compact adjacency encodings (varint int sets,
    util/Ints.scala:44-60; byte-array adjacency,
    examples/EfficientSssp.scala:106-110) — here: per-partition sorted
    parallel arrays (srcs, dsts, weights) consumed by a vectorized
    numpy gather-scatter kernel inside applyInPandas.

    pid = pmod(xxhash64(src) [+ salt], P) — the same function the
    engine applies to the frontier so cogroup lines up without an
    extra shuffle key. With ``n_salts > 1`` a source's adjacency is
    spread across n_salts pids keyed by hash(dst) — hub-vertex skew
    neutralization for the CSR path (the frontier is replicated
    ×n_salts to reach every sub-partition; sum/min aggregation is
    associative so results are unchanged — tests assert equality).

    A partition bigger than ``max_chunk_edges`` is emitted as SEVERAL
    chunk rows covering consecutive slices of the sorted edge order —
    at 10^9 edges / 200 partitions a single monolithic row would hold
    5M-element arrays ×3 and drift toward Arrow's 2 GiB row/batch
    limits; 4M-edge chunks stay ~100 MB. The SpMV kernel gathers each
    chunk independently (chunks slice the sorted src range, so
    searchsorted stays correct) and locally combines the partials.
    """
    import numpy as np  # noqa: PLC0415 — worker-side import kept local

    pid_base = F.xxhash64(F.col("src"))
    if n_salts > 1:
        pid_base = pid_base + F.pmod(F.xxhash64(F.col("dst")), F.lit(n_salts))
    pid = F.pmod(pid_base, F.lit(num_partitions)).cast("int")

    def _pack(pdf):
        import pandas as pd  # noqa: PLC0415

        src = pdf["src"].to_numpy(dtype=np.int64)
        order = np.lexsort((pdf["dst"].to_numpy(dtype=np.int64), src))
        srcs = src[order]
        dsts = pdf["dst"].to_numpy(dtype=np.int64)[order]
        wts = pdf[weight_col].to_numpy(dtype=np.float64)[order]
        p = int(pdf["pid"].iloc[0])
        n = len(srcs)
        bounds = list(range(0, n, max_chunk_edges)) or [0]
        return pd.DataFrame(
            {
                "pid": [p] * len(bounds),
                "srcs": [srcs[b : b + max_chunk_edges] for b in bounds],
                "dsts": [dsts[b : b + max_chunk_edges] for b in bounds],
                "weights": [wts[b : b + max_chunk_edges] for b in bounds],
            }
        )

    cols = edges.select("src", "dst", F.col(weight_col).alias(weight_col), pid.alias("pid"))
    return cols.groupBy("pid").applyInPandas(_pack, CSR_SCHEMA)


def frontier_pid(id_col, num_partitions: int, salt_col=None):
    """Partition-id expression matching :func:`csr_pack` (pass the
    0..n_salts-1 replica index as ``salt_col`` for salted packs)."""
    base = F.xxhash64(id_col)
    if salt_col is not None:
        base = base + salt_col
    return F.pmod(base, F.lit(num_partitions)).cast("int")


def project_bipartite(
    edges: DataFrame,
    *,
    group_col: str = "src",
    item_col: str = "dst",
    max_group: int = 1000,
    min_weight: int = 1,
) -> DataFrame:
    """Project a bipartite (group, item) edge table onto the item side:
    returns (src, dst, weight) with src < dst and weight = number of
    groups containing both items — the standard way link graphs are
    BUILT from tabular co-occurrence (orders x parts, docs x terms,
    commits x files).

    Pair expansion is quadratic per group, so groups larger than
    ``max_group`` are dropped BEFORE any per-group array materializes
    (window count over the same single exchange the gather reuses —
    the LSH hot-bucket shape, data/dedup.py). A 10^6-item degenerate
    group would otherwise emit 10^12 pairs; capped, per-group memory
    and output are O(max_group) / O(max_group^2). ``min_weight``
    prunes the long tail of single-co-occurrence pairs at the source.
    """
    from pyspark.sql import Window

    e = (
        edges.select(
            F.col(group_col).cast("long").alias("g"),
            F.col(item_col).cast("long").alias("i"),
        )
        .distinct()
    )
    w = Window.partitionBy("g")
    groups = (
        e.withColumn("__gsz", F.count("*").over(w))
        .filter((F.col("__gsz") >= 2) & (F.col("__gsz") <= F.lit(max_group)))
        .groupBy("g")
        .agg(F.collect_list("i").alias("items"))
    )
    return (
        groups.select(F.explode("items").alias("src"), F.col("items"))
        .select("src", F.explode("items").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
        .filter(F.col("weight") >= F.lit(min_weight))
    )


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    *,
    drop_self_loops: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Contract a vertex-level edge list onto a coarser partition of the
    vertex set: the page-graph → host-graph rollup of web analytics
    (here: file-level code links → package/repo-level links).

    ``mapping`` is DataFrame[id, group]; every edge (src, dst) becomes
    (group(src), group(dst)), aggregated to one row per group pair with
    ``weight`` = number of underlying edges (or sum of ``weight_col``).
    Vertices missing from ``mapping`` drop out (inner join — the same
    undeliverable-signal default as the engine,
    interfaces/Handlers.scala:39-50).

    Scale shape: two hash joins on the vertex id (the mapping is a dim
    table — at web scale it is usually small enough per-partition that
    AQE broadcasts it; at 10^12 vertices both joins co-partition on id)
    followed by ONE hash aggregation on the (gsrc, gdst) pair with
    map-side combine — the group-pair domain is quadratically smaller
    than the edge domain, so partial aggregation collapses the shuffle.
    All expression-only.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    m_src = mapping.select(F.col("id").alias("__sid"), F.col("group").alias("gsrc"))
    m_dst = mapping.select(F.col("id").alias("__did"), F.col("group").alias("gdst"))
    out = (
        edges.select(F.col("src"), F.col("dst"), w.alias("__w"))
        .join(m_src, F.col("src") == F.col("__sid"), "inner")
        .join(m_dst, F.col("dst") == F.col("__did"), "inner")
        .groupBy("gsrc", "gdst")
        .agg(F.sum("__w").alias("weight"), F.count("*").alias("n_edges"))
    )
    if drop_self_loops:
        out = out.filter(F.col("gsrc") != F.col("gdst"))
    return out
