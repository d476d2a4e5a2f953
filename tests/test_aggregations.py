"""Aggregation surface ≙ features/AggregationOperationsSpec.scala:33-162."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import aggregations as A
from signal_collect_spark import fixtures as FX


@pytest.fixture(scope="module")
def state(spark):
    # two vertices with state 1.0 — the spec's graph (SumOfStates == 2.0,
    # ProductOfStates == 1.0)
    return spark.createDataFrame([(0, 1.0), (1, 1.0)], "id long, state double")


def test_sum_of_states(spark, state):
    assert A.sum_of_states(state) == pytest.approx(2.0)


def test_product_of_states(spark, state):
    assert A.product_of_states(state) == pytest.approx(1.0)
    mixed = spark.createDataFrame(
        [(0, 2.0), (1, -3.0), (2, 0.5)], "id long, state double"
    )
    assert A.product_of_states(mixed) == pytest.approx(-3.0)
    with_zero = spark.createDataFrame([(0, 2.0), (1, 0.0)], "id long, state double")
    assert A.product_of_states(with_zero) == 0.0


def test_count_vertices(spark, state):
    assert A.count_vertices(state) == 2
    assert A.count_vertices(state, F.col("id") > 0) == 1


def test_id_state_map_and_sample(spark, state):
    assert A.id_state_map(state) == {0: 1.0, 1: 1.0}
    ids = A.sample_vertex_ids(state, 1)
    assert len(ids) == 1 and ids[0] in (0, 1)


def test_top_k_states_order(spark):
    df = spark.createDataFrame(
        [(0, 0.3), (1, 0.9), (2, 0.9), (3, 0.1)], "id long, state double"
    )
    rows = A.top_k_states(df, 3).collect()
    assert [(r["id"], r["state"]) for r in rows] == [(1, 0.9), (2, 0.9), (0, 0.3)]


def test_top_degree_and_vicinity(spark):
    edges = FX.edges_df(spark, FX.star5_symmetric())
    top = A.top_degree(edges, 1).collect()
    assert top[0]["id"] == 4 and top[0]["degree"] == 4
    vic = {r["id"] for r in A.vertex_vicinities(edges, [4]).collect()}
    assert vic == {0, 1, 2, 3}


def test_above_threshold_and_find(spark):
    df = spark.createDataFrame(
        [(0, 0.005), (1, 0.5)], "id long, residual double"
    )
    assert [r["id"] for r in A.above_threshold(df, 0.01).collect()] == [1]
    assert [r["id"] for r in A.find_vertices_by_ids(df, [0]).collect()] == [0]


def test_map_reduce(spark, state):
    # Graph.mapReduce: map = state*2, reduce = sum
    assert A.map_reduce(state, F.col("state") * 2, F.sum) == pytest.approx(4.0)
