"""Round-4 additions, batch g: SALSA and the per-source corpus
length-quantile profile — each checked against an independent numpy /
pure-Python reference."""

from __future__ import annotations

import numpy as np
import pytest

from signal_collect_spark import graph as G
from signal_collect_spark.algorithms.salsa import salsa
from signal_collect_spark.data.textstats import corpus_profile


def _np_salsa(pairs: list[tuple[int, int]], steps: int) -> dict[int, tuple[float, float]]:
    """Dense-matrix reference: h_k = W_c^T a_{k-1}; a_k = W_r^T h_k
    where W_r is the row-(out-)normalized and W_c the column-(in-)
    normalized adjacency."""
    ids = sorted({x for p in pairs for x in p})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for u, v in pairs:
        if u != v:
            A[ix[u], ix[v]] = 1.0
    outd = A.sum(axis=1)
    ind = A.sum(axis=0)
    Wr = np.divide(A, outd[:, None], out=np.zeros_like(A), where=outd[:, None] > 0)
    Wc = np.divide(A, ind[None, :], out=np.zeros_like(A), where=ind[None, :] > 0)
    a = (ind > 0).astype(float)
    a /= a.sum()
    h = np.zeros(n)
    for _ in range(steps):
        h = Wc @ a      # h(u) = sum_v A[u,v] * a(v)/ind(v)
        a = Wr.T @ h    # a(w) = sum_u A[u,w] * h(u)/outd(u)
    return {v: (h[ix[v]], a[ix[v]]) for v in ids}


def test_salsa_matches_numpy_iteration(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2), (4, 3), (1, 4)]
    edges = G.edges_from_pairs(spark, pairs)
    out, info = salsa(spark, edges, steps=7, num_partitions=4)
    ref = _np_salsa(pairs, 7)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    assert set(got) == set(ref)
    for v, (h, a) in ref.items():
        assert got[v][0] == pytest.approx(h, abs=1e-12)
        assert got[v][1] == pytest.approx(a, abs=1e-12)
    assert info.supersteps == 7


def test_salsa_mass_conserved_and_degree_fixpoint(spark):
    # on a strongly connected graph the authority chain's stationary
    # distribution is indeg/|E|; many steps should approach it, and L1
    # mass stays 1 at every iterate (the half-steps are stochastic)
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1), (1, 0)]
    edges = G.edges_from_pairs(spark, pairs)
    out, _ = salsa(spark, edges, steps=40, num_partitions=2)
    got = {r["id"]: r["authority"] for r in out.collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in (0, 1, 2):
        assert got[v] == pytest.approx(2.0 / 6.0, abs=1e-9)


def test_salsa_sink_and_source_vertices(spark):
    pairs = [(0, 9), (0, 1), (1, 9)]
    edges = G.edges_from_pairs(spark, pairs)
    out, _ = salsa(spark, edges, steps=6, num_partitions=2)
    ref = _np_salsa(pairs, 6)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    for v in ref:
        assert got[v][0] == pytest.approx(ref[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(ref[v][1], abs=1e-12)
    assert got[9][0] == 0.0   # pure sink: no out-edges, hub 0
    assert got[0][1] == 0.0   # pure source: no in-edges, authority 0


def test_salsa_releases_caches(spark):
    edges = G.edges_from_pairs(spark, [(0, 1), (1, 2), (2, 0)])
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out, _ = salsa(spark, edges, steps=3, num_partitions=2)
    out.count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before + 1  # only the eager localCheckpoint result


def test_corpus_profile_exact_quantiles(spark):
    # src a: token counts 1..5 (chars vary), src b: constant
    rows = [
        ("a", "w"),
        ("a", "w w"),
        ("a", "w w w"),
        ("a", "w w w w"),
        ("a", "w w w w w"),
        ("b", "xx yy"),
        ("b", "xx yy"),
    ]
    docs = spark.createDataFrame(rows, ["source", "text"])
    out = corpus_profile(docs, quantiles=(0.0, 0.5, 0.75, 1.0))
    got = {
        (r["source"], r["p"]): (r["n_docs"], r["chars_q"], r["tokens_q"])
        for r in out.collect()
    }
    # numpy's linear interpolation == Spark percentile == DuckDB quantile_cont
    toks_a = [1, 2, 3, 4, 5]
    chars_a = [1, 3, 5, 7, 9]
    for p in (0.0, 0.5, 0.75, 1.0):
        n, cq, tq = got[("a", p)]
        assert n == 5
        assert cq == pytest.approx(float(np.quantile(chars_a, p)), abs=1e-9)
        assert tq == pytest.approx(float(np.quantile(toks_a, p)), abs=1e-9)
    assert got[("b", 0.75)] == (2, 5.0, 2.0)
    assert len(got) == 8
