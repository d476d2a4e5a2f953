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
    # the iterates are localCheckpoint-ed (plan truncation; blocks are
    # ContextCleaner-reclaimed), so the CACHE MANAGER must end empty —
    # the hamiltonian/crawler pattern
    spark.catalog.clearCache()
    edges = G.edges_from_pairs(spark, [(0, 1), (1, 2), (2, 0)])
    out, _ = salsa(spark, edges, steps=3, num_partitions=2)
    out.count()
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty(), "salsa left DataFrames cached"


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


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------


def _py_modularity(pairs_w, labels):
    und = set()
    for a, b, w in pairs_w:
        if a != b:
            und.add((a, b, w))
            und.add((b, a, w))
    W = sum(w for _, _, w in und)
    deg = {}
    for a, _b, w in und:
        deg[a] = deg.get(a, 0.0) + w
    in_w = sum(
        w
        for a, b, w in und
        if labels.get(a) is not None and labels.get(a) == labels.get(b)
    )
    K = {}
    for v, k in deg.items():
        lab = labels.get(v)
        if lab is not None:
            K[lab] = K.get(lab, 0.0) + k
    return in_w / W - sum((k / W) ** 2 for k in K.values())


def _modularity_df(spark, pairs_w, labels):
    from signal_collect_spark.algorithms.modularity import modularity

    edges = spark.createDataFrame(pairs_w, "src long, dst long, weight double")
    lab = spark.createDataFrame(list(labels.items()), "id long, label long")
    return modularity(edges, lab).first()


def test_modularity_two_triangles(spark):
    # two triangles bridged by one edge; the natural partition
    pairs = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
             (3, 4, 1.0), (4, 5, 1.0), (5, 3, 1.0), (2, 3, 1.0)]
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    r = _modularity_df(spark, pairs, labels)
    assert r["modularity"] == pytest.approx(
        round(_py_modularity(pairs, labels), 6), abs=1e-9
    )
    assert r["n_communities"] == 2
    assert r["modularity"] > 0.3  # a genuinely good partition


def test_modularity_single_community_is_zero(spark):
    pairs = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0)]
    labels = {0: 7, 1: 7, 2: 7}
    r = _modularity_df(spark, pairs, labels)
    assert r["modularity"] == pytest.approx(0.0, abs=1e-9)
    assert r["n_communities"] == 1


def test_modularity_weighted_matches_python(spark):
    pairs = [(0, 1, 2.5), (1, 2, 0.5), (2, 3, 4.0), (3, 0, 1.0), (0, 2, 2.0)]
    labels = {0: 0, 1: 0, 2: 1, 3: 1}
    r = _modularity_df(spark, pairs, labels)
    assert r["modularity"] == pytest.approx(
        round(_py_modularity(pairs, labels), 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# unigram cross-entropy
# ---------------------------------------------------------------------------


def test_unigram_xent_matches_python(spark):
    import math
    from collections import Counter

    from signal_collect_spark.data.textstats import unigram_xent

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zq xv zq"),  # rare tokens -> highest cross-entropy
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["n_tokens"], r["xent_bits"]) for r in unigram_xent(docs).collect()}

    toks = {i: t.split(" ") for i, t in rows}
    cnt = Counter(tok for ts in toks.values() for tok in ts)
    T = sum(cnt.values())
    for i, ts in toks.items():
        want = -sum(math.log2(cnt[t] / T) for t in ts) / len(ts)
        assert got[i][0] == len(ts)
        assert got[i][1] == pytest.approx(round(want, 6), abs=1e-9)
    # the gibberish doc is the worst under the corpus's own LM
    assert got[3][1] > got[1][1] and got[3][1] > got[2][1]
