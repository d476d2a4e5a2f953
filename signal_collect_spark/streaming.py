"""Structured Streaming operators.

The reference has NO stream processing (its ContinuousAsynchronous mode,
ExecutionMode.scala:79, is a long-running computation — SURVEY.md §2.6).
This module is the engine's forward-looking streaming surface for
training-data pipelines at 100 TB: late-data-tolerant windowed
aggregation, custom stateful sessionization, and incremental edge-log
ingest that hands off to the batch superstep engine via its durable
checkpoints.

Patterns (all standard Spark):
  * ``windowed_event_counts`` — event-time window + watermark
  * ``sessionize``            — applyInPandasWithState with processing
    timeouts (the custom-stateful-operator escape hatch)
  * ``stream_edges_to_log``   — readStream → foreachBatch append to a
    partitioned parquet edge log; each batch records a monotonically
    increasing batch_id so downstream graph jobs are idempotent /
    exactly-once per log version
  * ``rank_refresh``          — batch job over the edge log that
    recomputes PageRank, resumable mid-run from the engine checkpoint

At cluster scale the edge log would be an Iceberg table (appends =
snapshots); parquet-directory-per-batch reproduces the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (schema pinned —
    never inferred on a stream)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window per event_type with late-data bound.

    Watermark bounds state: events later than ``watermark`` behind the
    max seen ts are dropped; window state older than that is evicted —
    the knob that keeps unbounded streams in bounded memory.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_STATE_SCHEMA = "n_events long, sum_value double, first_ts long, last_ts long"
SESSION_OUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, session_seconds double"
)


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user session aggregation with an
    inactivity gap — applyInPandasWithState (the supported path for
    semantics Spark's windowing can't express).

    Emits one row per CLOSED session (closed by an in-batch gap or a
    processing-time timeout). State per user: count, value sum,
    first/last event seconds.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415

        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            n, s, first, last = state.get
            rows.append((user_id, n, s, float(last - first)))
            state.remove()
        else:
            stamped = []
            for pdf in pdfs:
                for t, v in zip(pdf["ts"], pdf["value"]):
                    stamped.append((int(t.value // 1_000_000_000), float(v)))
            stamped.sort()
            if state.exists:
                n, s, first, last = state.get
            else:
                n, s, first, last = 0, 0.0, None, None
            for t, v in stamped:
                if last is not None and t - last > gap_seconds:
                    rows.append((user_id, n, s, float(last - first)))
                    n, s, first = 0, 0.0, None
                if first is None:
                    first = t
                n += 1
                s += v
                last = t
            if n > 0:
                state.update((n, s, first, last))
                state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            rows, columns=["user_id", "n_events", "sum_value", "session_seconds"]
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_edges_to_log(
    edges_stream: DataFrame, log_dir: str, checkpoint_dir: str
):
    """readStream(src,dst,weight) → append-only partitioned edge log.

    foreachBatch writes each micro-batch under ``batch_id=<n>/`` —
    idempotent on retry (same batch id overwrites itself), the parquet
    stand-in for Iceberg append snapshots.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                f"{log_dir}/batch_id={batch_id}"
            )
        )

    return (
        edges_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_edge_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.option("basePath", log_dir).parquet(f"{log_dir}/batch_id=*")


def rank_refresh(
    spark: SparkSession, log_dir: str, engine_checkpoint_dir: str, **pagerank_opts
):
    """Batch refresh over the accumulated edge log; resumable mid-run
    via the engine's durable checkpoints (superstep lineage included).

    ``engine_checkpoint_dir`` must be PER LOG VERSION (e.g. suffix the
    latest batch_id): a checkpoint only resumes the run over the same
    graph — resuming onto a grown log would mix fixpoints."""
    from signal_collect_spark.algorithms.pagerank import pagerank

    edges = read_edge_log(spark, log_dir).select("src", "dst", "weight")
    return pagerank(
        spark,
        edges,
        checkpoint_dir=engine_checkpoint_dir,
        resume=True,
        **pagerank_opts,
    )
