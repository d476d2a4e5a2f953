"""Sources/sinks (≙ loading/*) and mutation handlers (≙ GraphEditor +
Handlers; features/MultipleVertexAdditionsSpec, GraphModificationSpec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import mutation as MU
from signal_collect_spark import sources as SRC
from signal_collect_spark import fixtures as FX


def test_read_adjacency_list(spark, tmp_path):
    p = tmp_path / "adj.txt"
    # AdjacencyListLoader format: id out_degree targets...
    p.write_text("0 2 1 2\n1 1 2\n2 0\n\n3 1 0\n")
    edges = SRC.read_adjacency_list(spark, str(p))
    got = sorted((r["src"], r["dst"]) for r in edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2), (3, 0)]
    verts = {r["id"] for r in SRC.read_adjacency_vertices(spark, str(p)).collect()}
    assert verts == {0, 1, 2, 3}  # isolated vertex 2 included


def test_read_edge_list_and_roundtrip(spark, tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text("0 1 2.5\n1 2 1.0\n")
    edges = SRC.read_edge_list(spark, str(p), weighted=True)
    assert {(r["src"], r["dst"], r["weight"]) for r in edges.collect()} == {
        (0, 1, 2.5),
        (1, 2, 1.0),
    }
    out = str(tmp_path / "sink")
    SRC.write_edges(edges, out, buckets=2)
    back = spark.read.parquet(out)
    assert back.count() == 2 and "bucket" in back.columns


def test_add_vertices_duplicate_handlers(spark):
    ex = spark.createDataFrame([(0, 1.0), (1, 2.0)], "id long, state double")
    new = spark.createDataFrame([(1, 99.0), (2, 3.0)], "id long, state double")
    keep = {r["id"]: r["state"] for r in MU.add_vertices(ex, new).collect()}
    assert keep == {0: 1.0, 1: 2.0, 2: 3.0}  # reference default: keep existing
    repl = {r["id"]: r["state"] for r in MU.add_vertices(ex, new, "keep_new").collect()}
    assert repl == {0: 1.0, 1: 99.0, 2: 3.0}
    with pytest.raises(ValueError, match="duplicate"):
        MU.add_vertices(ex, new, "fail")


def test_add_edges_missing_vertex_handlers(spark):
    verts = spark.createDataFrame([(0,), (1,)], "id long")
    edges = FX.edges_df(spark, [(0, 1)])
    new = FX.edges_df(spark, [(1, 7)])
    v2, e2 = MU.add_edges(verts, edges, new, on_missing_vertex="create")
    assert {r["id"] for r in v2.collect()} == {0, 1, 7}
    assert e2.count() == 2
    v3, e3 = MU.add_edges(verts, edges, new, on_missing_vertex="drop")
    assert e3.count() == 1
    with pytest.raises(ValueError, match="missing"):
        MU.add_edges(verts, edges, new, on_missing_vertex="fail")


def test_remove_and_undeliverable(spark):
    edges = FX.edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    verts = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    ids = spark.createDataFrame([(1,)], "id long")
    v2, e2 = MU.remove_vertices(verts, edges, ids)
    assert {r["id"] for r in v2.collect()} == {0, 2}
    assert {(r["src"], r["dst"]) for r in e2.collect()} == {(2, 0)}
    sig = spark.createDataFrame([(0, 1.0), (9, 2.0)], "dst long, signal double")
    dead = MU.undeliverable_signals(sig, verts)
    assert [r["dst"] for r in dead.collect()] == [9]
    e4 = MU.remove_edges(edges, FX.edges_df(spark, [(0, 1)]))
    assert e4.count() == 2
