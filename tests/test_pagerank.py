"""PageRank conformance vs the reference's golden outputs + numpy oracle.

Mirrors IntegrationSpec.scala:110-164, ComputationTerminationSpec.scala:79-97
and VertexSpec.scala:34-52 (SURVEY.md §5).

Convergence economics: residual decays as 0.85^k, so a 1e-7 residual
(rank error ≤ ~6e-7) costs ~90 supersteps — ONE deep oracle test covers
that path (cycle5); golden ±0.01 assertions run with the tolerance they
actually need (~30 supersteps).
"""

from __future__ import annotations

import pytest

from signal_collect_spark import fixtures as FX
from signal_collect_spark.algorithms.pagerank import pagerank
from signal_collect_spark.oracle import pagerank_oracle


def _run(spark, pairs, **kw):
    kw.setdefault("num_partitions", 4)
    kw.setdefault("check_every", 4)
    kw.setdefault("converge_tol", 1e-3)
    edges = FX.edges_df(spark, pairs)
    state, info = pagerank(spark, edges, **kw)
    return {r["id"]: r["rank"] for r in state.collect()}, info


def test_cycle5_converges_to_one_deep_oracle(spark):
    # the deep-precision path: residual 1e-7 ⇒ rank error ≤ 6e-7 < 1e-6
    ranks, info = _run(spark, FX.cycle(5), converge_tol=1e-7, check_every=8)
    assert info.converged
    oracle = pagerank_oracle(FX.cycle(5))
    for v in ranks:
        assert ranks[v] == pytest.approx(1.0, abs=0.01)
        assert ranks[v] == pytest.approx(oracle[v], abs=1e-6)


def test_star5_center_066(spark):
    # IntegrationSpec.scala:124-136: center 0.66, leaves 0.15 ± 1e-5
    # (star converges exactly in 2 supersteps — leaves never receive)
    ranks, info = _run(spark, FX.star5(), converge_tol=1e-9)
    assert ranks[4] == pytest.approx(0.66, abs=1e-5)
    for leaf in range(4):
        assert ranks[leaf] == pytest.approx(0.15, abs=1e-5)


def test_grid2x2(spark):
    ranks, _ = _run(spark, FX.grid(2, 2))
    oracle = pagerank_oracle(FX.grid(2, 2))
    for v in ranks:
        assert ranks[v] == pytest.approx(1.0, abs=0.01)
        assert ranks[v] == pytest.approx(oracle[v], abs=0.01)


def test_torus5x5(spark):
    ranks, _ = _run(spark, FX.torus(5))
    for v, r in ranks.items():
        assert r == pytest.approx(1.0, abs=0.01)


def test_one_superstep_cycle1000_is_02775(spark):
    # ComputationTerminationSpec.scala:79-97: exactly one synchronous
    # superstep on a 1000-cycle ⇒ every state == 0.2775 == 0.15+0.85*0.15
    ranks, info = _run(spark, FX.cycle(1000), max_steps=1, signal_threshold=0.0)
    assert info.supersteps == 1
    vals = set(ranks.values())
    assert len(vals) == 1  # every vertex identical after 1 superstep
    # 0.15 + 0.85*0.15 in IEEE doubles (the reference computes the same
    # double arithmetic; 0.2775 is its decimal rendering)
    assert vals.pop() == pytest.approx(0.2775, abs=1e-12)


def test_dangling_mass_not_redistributed(spark):
    # v2 has no out-edges (dangling): reference never redistributes its mass
    pairs = [(0, 1), (1, 2)]
    ranks, _ = _run(spark, pairs, converge_tol=1e-9)
    oracle = pagerank_oracle(pairs)
    assert ranks[0] == pytest.approx(0.15, abs=1e-9)
    assert ranks[1] == pytest.approx(0.15 + 0.85 * 0.15, abs=1e-6)
    for v in ranks:
        assert ranks[v] == pytest.approx(oracle[v], abs=1e-6)


def test_weighted_edges_respect_sum_out_weights(spark):
    # signal = state*weight/sumOfOutWeights (PageRank.scala:39)
    pairs = [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
    ranks, _ = _run(spark, pairs, converge_tol=1e-7, check_every=8)
    oracle = pagerank_oracle(pairs)
    for v in ranks:
        assert ranks[v] == pytest.approx(oracle[v], abs=1e-6)


def test_signal_threshold_gating(spark):
    # default reference threshold 0.01 (ExecutionConfiguration.scala:31):
    # convergence is coarser but in-tolerance for the 0.01 golden bound
    ranks, info = _run(spark, FX.cycle(5), signal_threshold=0.01, converge_tol=0.01)
    for v, r in ranks.items():
        assert r == pytest.approx(1.0, abs=0.1)
    _, tight = _run(spark, FX.cycle(5), converge_tol=1e-4)
    assert info.supersteps < tight.supersteps


def test_csr_mode_equals_sql_mode(spark):
    # mode equivalence needs identical supersteps, not deep convergence
    for pairs in (FX.cycle(5), FX.star5(), FX.torus(5)):
        sql_ranks, _ = _run(spark, pairs, mode="sql", max_steps=12, converge_tol=1e-12)
        csr_ranks, _ = _run(spark, pairs, mode="csr", max_steps=12, converge_tol=1e-12)
        assert set(sql_ranks) == set(csr_ranks)
        for v in sql_ranks:
            assert sql_ranks[v] == pytest.approx(csr_ranks[v], abs=1e-12)
