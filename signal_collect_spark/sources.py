"""Graph sources and sinks.

Reference loaders (SURVEY.md §2.4):
  * AdjacencyListLoader — ASCII lines ``id #out out1 out2 …``
    (loading/AdjacencyListLoader.scala:40-94)
  * Loading.loader / intEdgeIdsOrderedBySourceId — edge tuples ordered
    by source id (loading/Loading.scala:35-53; ASCII int reader
    util/FileReader.scala:26-133)
  * binary varint splits (examples/EfficientSssp.scala:40-87,
    util/Ints.scala:44-160)

Spark-native equivalents below: text/CSV/parquet readers producing the
canonical ``edges (src, dst, weight)`` DataFrame; sinks write
partitioned parquet (the stand-in for Iceberg tables — same layout,
same pushdown/pruning behavior at the reader). Everything is a single
distributed scan; the varint compression of the reference is subsumed
by parquet encodings (delta/dictionary/RLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_adjacency_list(spark: SparkSession, path: str) -> DataFrame:
    """ASCII adjacency lines ``id out_degree t1 t2 …`` → edges.

    Vertices with zero out-edges (``id 0``) contribute no edge rows but
    ARE part of the graph — recover them via :func:`read_adjacency_vertices`.
    """
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            toks[0].cast("long").alias("src"),
            F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))).alias("targets"),
        )
        .select("src", F.explode("targets").alias("t"))
        .select("src", F.col("t").cast("long").alias("dst"), F.lit(1.0).alias("weight"))
    )


def read_adjacency_vertices(spark: SparkSession, path: str) -> DataFrame:
    """All vertex ids in an adjacency-list file, including isolated ones."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    src = lines.filter(F.length(F.trim(F.col("value"))) > 0).select(
        toks[0].cast("long").alias("id")
    )
    dst = read_adjacency_list(spark, path).select(F.col("dst").alias("id"))
    return src.unionAll(dst).distinct()


def read_edge_list(
    spark: SparkSession, path: str, delimiter: str = " ", weighted: bool = False
) -> DataFrame:
    """Edge-list text/CSV: ``src<delim>dst[<delim>weight]`` → edges."""
    schema = "src long, dst long" + (", weight double" if weighted else "")
    df = spark.read.option("delimiter", delimiter).schema(schema).csv(path)
    if not weighted:
        df = df.withColumn("weight", F.lit(1.0))
    return df


def read_edges_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_edges(edges: DataFrame, path: str, buckets: int | None = None) -> None:
    """Sink: partitioned parquet, pre-shuffled by src so downstream
    iterative reads are co-located without a fresh shuffle. With
    ``buckets``, writes a bucketed table layout (src-hash directories)."""
    out = edges
    if buckets:
        out = edges.repartition(buckets, "src").withColumn(
            "bucket", F.pmod(F.xxhash64("src"), F.lit(buckets)).cast("int")
        )
        out.write.mode("overwrite").partitionBy("bucket").parquet(path)
    else:
        out.write.mode("overwrite").parquet(path)


def write_state(state: DataFrame, path: str) -> None:
    """Sink for algorithm outputs (id, state…) — plain parquet; the
    checkpoint manager handles the lineage-carrying variant."""
    state.write.mode("overwrite").parquet(path)
