"""signal_collect_spark — a PySpark-native link-graph analytics engine.

A brand-new implementation (NOT a port) of the query/data-processing
capabilities of uzh/signal-collect (Scala/Akka vertex-centric engine,
reference at /root/reference): the signal/collect vertex-centric model
re-expressed as bounded synchronous supersteps over DataFrames —
each superstep is a sparse gather-scatter (frontier ⋈ edges → groupBy(dst)
partial/final aggregate → state update), with delta-based signaling
(score-guided scheduling, WorkerImplementation.scala:213-215), an
optional CSR-packed Arrow/numpy SpMV execution mode, parquet
checkpoints with per-partition lineage, and exact resume.

Built-in algorithms (the reference's example/conformance surface,
SURVEY.md §2.2): PageRank, connected components, label propagation,
triangle counting, SSSP — plus the aggregation operators of
com.signalcollect.AggregationOperations and a training-data toolkit
(dedup, similarity search, text analysis) for 100 TB-scale pipelines.
"""

from signal_collect_spark.session import get_spark


def build_graph(spark, edges=None, num_partitions=None):
    """≙ GraphBuilder.build: the reference-shaped entry point; returns a
    :class:`signal_collect_spark.graph_builder.SparkGraph` facade.
    (Named build_graph, not graph_builder: importing the submodule of
    that name would rebind the package attribute and shadow a
    same-named function.)"""
    from signal_collect_spark.graph_builder import SparkGraph

    return SparkGraph(spark, edges=edges, num_partitions=num_partitions)


__all__ = ["get_spark", "build_graph"]
__version__ = "0.2.0"
