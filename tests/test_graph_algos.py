"""CC / SSSP / label propagation / triangles conformance (exact results).

Mirrors IntegrationSpec.scala:196-222 (SSSP), the ChineseWhispers
example graph, and ClusteringCoefficient.scala:49-78 (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from signal_collect_spark import fixtures as FX
from signal_collect_spark.algorithms import (
    connected_components,
    label_propagation,
    local_clustering_coefficient,
    sssp,
    triangle_count,
)
from signal_collect_spark.algorithms.triangles import per_vertex_triangles
from signal_collect_spark.oracle import (
    cc_oracle,
    label_propagation_oracle,
    sssp_oracle,
    triangles_oracle,
)

OPTS = {"num_partitions": 4, "check_every": 4}


def test_sssp_cycle4_exact(spark):
    # IntegrationSpec.scala:196-208: dist(v) == v on the 4-cycle from 0
    edges = FX.edges_df(spark, FX.sssp_cycle4())
    state, info = sssp(spark, edges, 0, **OPTS)
    dists = {r["id"]: r["dist"] for r in state.collect()}
    assert dists == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}
    assert info.converged


def test_sssp_star5_exact(spark):
    # IntegrationSpec.scala:210-222: source 4 → {0,1}
    edges = FX.edges_df(spark, FX.star5_symmetric())
    state, _ = sssp(spark, edges, 4, **OPTS)
    dists = {r["id"]: r["dist"] for r in state.collect()}
    assert dists == {4: 0.0, 0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}


def test_sssp_unreachable_is_null(spark):
    edges = FX.edges_df(spark, [(0, 1), (2, 3)])
    state, _ = sssp(spark, edges, 0, **OPTS)
    dists = {r["id"]: r["dist"] for r in state.collect()}
    assert dists[0] == 0.0 and dists[1] == 1.0
    assert dists[2] is None and dists[3] is None


def test_sssp_weighted_matches_dijkstra(spark):
    pairs = [(0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0), (2, 3, 10.0)]
    edges = FX.edges_df(spark, pairs)
    state, _ = sssp(spark, edges, 0, **OPTS)
    dists = {r["id"]: r["dist"] for r in state.collect()}
    oracle = sssp_oracle(pairs, 0)
    assert dists == oracle  # 0:0, 2:1, 1:2, 3:3


def test_cc_two_components_and_singletons(spark):
    edges = FX.edges_df(spark, FX.cc_components())
    state, info = connected_components(spark, edges, **OPTS)
    comp = {r["id"]: r["component"] for r in state.collect()}
    oracle = cc_oracle(FX.cc_components())
    assert comp == oracle
    assert {comp[i] for i in range(5)} == {0}
    assert {comp[i] for i in range(100, 105)} == {100}
    assert comp[200] == 200 and comp[201] == 201 and comp[202] == 202


def test_cc_directed_edges_still_undirected_components(spark):
    # a→b chain: one undirected component although unreachable directed-ly
    edges = FX.edges_df(spark, [(3, 2), (1, 2), (0, 1)])
    state, _ = connected_components(spark, edges, **OPTS)
    comp = {r["id"]: r["component"] for r in state.collect()}
    assert set(comp.values()) == {0}


def test_cc_csr_mode_matches(spark):
    edges = FX.edges_df(spark, FX.cc_components())
    sql_state, _ = connected_components(spark, edges, mode="sql", **OPTS)
    csr_state, _ = connected_components(spark, edges, mode="csr", **OPTS)
    assert {(r["id"], r["component"]) for r in sql_state.collect()} == {
        (r["id"], r["component"]) for r in csr_state.collect()
    }


def test_label_propagation_cw_clusters(spark):
    # two triads joined by a chain; converged synchronous LP with the
    # pinned tie-break must match the python oracle exactly
    pairs = FX.cw_clusters()
    edges = FX.edges_df(spark, pairs)
    state, info = label_propagation(
        spark, edges, max_steps=8, run_to_convergence=False, num_partitions=4
    )
    labels = {r["id"]: r["label"] for r in state.collect()}
    oracle = label_propagation_oracle(pairs, rounds=8)
    assert labels == oracle
    # triad members agree on a label
    assert len({labels[0], labels[1], labels[2]}) == 1
    assert len({labels[8], labels[9], labels[10]}) == 1


def test_label_propagation_fixed_rounds_deterministic(spark):
    pairs = FX.cw_clusters()
    edges = FX.edges_df(spark, pairs)
    a, _ = label_propagation(spark, edges, max_steps=3, run_to_convergence=False, num_partitions=4)
    b, _ = label_propagation(spark, edges, max_steps=3, run_to_convergence=False, num_partitions=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    oracle = label_propagation_oracle(pairs, rounds=3)
    assert {r["id"]: r["label"] for r in a.collect()} == oracle


def test_triangles_tri6(spark):
    # ClusteringCoefficient example graph: triangles 1-2-3, 1-3-5, 1-5-6
    edges = FX.edges_df(spark, FX.tri6())
    assert triangle_count(spark, edges) == 3
    per = {r["id"]: r["tri_count"] for r in per_vertex_triangles(edges).collect()}
    _, oracle_per = triangles_oracle(FX.tri6())
    assert per == oracle_per
    assert per[1] == 3 and per[4] == 0


def test_local_clustering_coefficient_tri6(spark):
    edges = FX.edges_df(spark, FX.tri6())
    rows = {r["id"]: r for r in local_clustering_coefficient(spark, edges).collect()}
    # vertex 1: deg 5, 3 triangles → 2*3/(5*4) = 0.3
    assert rows[1]["local_coeff"] == pytest.approx(0.3)
    # vertex 4: deg 1 → undefined (reference NaN; we surface NULL)
    assert rows[4]["local_coeff"] is None
    # vertex 2: deg 2, 1 triangle → 2*1/(2*1) = 1.0
    assert rows[2]["local_coeff"] == pytest.approx(1.0)


def test_triangles_ignore_duplicates_and_direction(spark):
    # duplicate + reversed edges must not double-count
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (0, 2)]
    edges = FX.edges_df(spark, pairs)
    assert triangle_count(spark, edges) == 1


def test_csr_salted_equals_unsalted(spark):
    # hub-skew neutralization for the CSR path: identical results
    from signal_collect_spark.algorithms.pagerank import pagerank
    import pytest as _pt

    hub_pairs = [(i, 999) for i in range(40)] + [(999, i) for i in range(10)] + FX.cycle(10)
    edges = FX.edges_df(spark, hub_pairs)
    plain, _ = pagerank(spark, edges, max_steps=8, converge_tol=1e-12, mode="csr", **OPTS)
    salted, _ = pagerank(
        spark, edges, max_steps=8, converge_tol=1e-12, mode="csr", csr_salts=4, **OPTS
    )
    a = {r["id"]: r["rank"] for r in plain.collect()}
    b = {r["id"]: r["rank"] for r in salted.collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert a[v] == _pt.approx(b[v], abs=1e-12), v
