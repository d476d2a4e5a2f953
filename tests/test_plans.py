"""Physical-plan shape assertions — the scale-critical properties:
parquet column pruning + filter pushdown, shuffle-hash signal join,
map-side partial aggregation, co-partitioned (exchange-free) state
update. These are the '.explain and iterate' guarantees frozen as
regression tests."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import fixtures as FX
from signal_collect_spark import graph as G
from signal_collect_spark.algorithms.pagerank import pagerank_kernel


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def superstep_plan(spark):
    edges = FX.edges_df(spark, FX.torus(5))
    norm = G.normalize_edges(edges).repartition(8, "src").persist()
    k = pagerank_kernel(0.0)
    state = k.init(G.vertices_from_edges(edges)).repartition(8, "id").persist()
    frontier = (
        state.filter("residual > 0")
        .select("id", k.value().alias("value"))
        .hint("shuffle_hash")
        .alias("f")
    )
    sig = frontier.join(norm.alias("e"), F.col("f.id") == F.col("e.src")).select(
        F.col("e.dst").alias("dst"),
        (F.col("f.value") * F.col("e.norm_weight")).alias("m"),
    )
    inbox = sig.groupBy("dst").agg(F.sum("m").alias("inbox")).select(
        F.col("dst").alias("__inbox_id"), "inbox"
    )
    joined = state.alias("s").join(
        inbox.hint("shuffle_hash").alias("i"),
        F.col("s.id") == F.col("i.__inbox_id"),
        "left",
    )
    plan = _plan(joined)
    norm.unpersist()
    state.unpersist()
    return plan


def test_signal_join_is_shuffle_hash(superstep_plan):
    # SMJ would re-sort the edge table every superstep
    assert "ShuffledHashJoin" in superstep_plan


def test_inbox_has_partial_aggregation(superstep_plan):
    # partial (map-side) + final HashAggregate pair = message combining
    assert superstep_plan.count("HashAggregate") >= 2


def test_no_cartesian_or_bnl_in_superstep(superstep_plan):
    assert "CartesianProduct" not in superstep_plan
    assert "BroadcastNestedLoopJoin" not in superstep_plan


def test_parquet_scan_prunes_columns(spark):
    # token_stats over documents must read only doc_id + text
    from signal_collect_spark.data.textstats import token_stats

    df = token_stats(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_parquet_filter_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_linenumber") == 1)
        .select("l_orderkey")
    )
    plan = _plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_linenumber" in pushed[0]


def test_ann_broadcasts_queries(spark):
    import numpy as np

    from signal_collect_spark.data.similarity import cosine_scores

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)
    plan = _plan(cosine_scores(emb, q))
    # the small query side must broadcast — a shuffle of the corpus
    # against 3 rows would be wrong at 10^9 vectors
    assert "BroadcastExchange" in plan
