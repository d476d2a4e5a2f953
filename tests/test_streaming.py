"""Structured Streaming surface: windowed aggs, stateful sessionization,
edge-log ingest → batch rank refresh (availableNow triggers, memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import streaming as ST
from signal_collect_spark import fixtures as FX


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events"))
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_event_counts_match_batch(spark, events_dir):
    stream = ST.read_event_stream(spark, events_dir)
    q = (
        ST.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # availableNow + append mode: only windows older than the watermark
    # are emitted — every emitted window must match the batch answer
    assert len(g) > 0
    for k, v in g.items():
        assert b[k] == v


def test_sessionize_closes_on_gap(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions separated by a 2h gap
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),
        (1, base + dt.timedelta(hours=3), 5.0),
        # user 2: single session (never closed in-batch)
        (2, base, 7.0),
    ]
    df = spark.createDataFrame(
        [(i, t, u, "click", v, "{}") for i, (u, t, v) in enumerate(rows)],
        ST.EVENT_SCHEMA,
    )
    d = str(tmp_path / "ev")
    df.write.parquet(d)
    stream = ST.read_event_stream(spark, d)
    q = (
        ST.sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sessions").collect()
    closed = {(r["user_id"], r["n_events"], r["sum_value"], r["session_seconds"]) for r in out}
    # only user 1's first session closes within the batch
    assert closed == {(1, 2, 3.0, 600.0)}


def test_edge_log_ingest_and_rank_refresh(spark, tmp_path):
    edges = FX.edges_df(spark, FX.star5())
    src_dir = str(tmp_path / "stream_src")
    edges.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("src long, dst long, weight double").parquet(src_dir)
    log_dir = str(tmp_path / "edge_log")
    ck = str(tmp_path / "stream_ck")
    q = ST.stream_edges_to_log(stream, log_dir, ck).start()
    q.awaitTermination(120)

    logged = ST.read_edge_log(spark, log_dir)
    assert logged.count() == 4 and "batch_id" in logged.columns

    state, info = ST.rank_refresh(
        spark,
        log_dir,
        str(tmp_path / "engine_ck"),
        converge_tol=1e-9,
        num_partitions=4,
    )
    ranks = {r["id"]: r["rank"] for r in state.collect()}
    assert ranks[4] == pytest.approx(0.66, abs=1e-5)


@pytest.fixture(scope="module")
def dup_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dup_events"))
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    # duplicate every event's CONTENT under fresh event ids
    dup = src.withColumn("event_id", F.col("event_id") + 10_000)
    src.unionAll(dup).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_stream_dedup_matches_batch(spark, dup_events_dir):
    cols = ["user_id", "event_type", "value", "props"]
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(dup_events_dir)
    deduped = ST.stream_dedup(stream, cols)
    # the streaming branch must use DeduplicateWithinWatermark — plain
    # Deduplicate keyed on content_key alone never evicts state
    plan = deduped._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan
    q = (
        deduped
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select content_key from dedup_stream")
    batch = ST.stream_dedup(spark.read.parquet(dup_events_dir), cols)
    g = sorted(r["content_key"] for r in got.collect())
    b = sorted(r["content_key"] for r in batch.collect())
    assert g == b and len(g) == len(set(g))
    # every duplicated content row collapsed to ONE survivor
    n_content = (
        spark.read.parquet(dup_events_dir).select(*cols).distinct().count()
    )
    assert len(g) == n_content
