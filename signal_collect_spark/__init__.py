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

__all__ = ["get_spark"]
__version__ = "0.1.0"
