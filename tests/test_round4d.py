"""Round-4 additions: TrustRank/spam mass, DAG levels, k-truss,
prefix-filtered exact Jaccard join, inverted index — each vs an
independent pure-Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.dag import dag_levels, orient_acyclic
from signal_collect_spark.algorithms.trustrank import trustrank
from signal_collect_spark.algorithms.truss import k_truss
from signal_collect_spark.data.index import inverted_index
from signal_collect_spark.data.setjoin import prefix_jaccard_pairs

EDGES = [
    (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (6, 1),
    (2, 4), (7, 8), (8, 7), (5, 1),
]


def _python_pagerank(pairs, p, iters=300):
    outn = {}
    for a, b in pairs:
        outn.setdefault(a, []).append(b)
    verts = sorted({v for e in pairs for v in e})
    r = {v: 0.15 * p.get(v, 0.0) for v in verts}
    for _ in range(iters):
        acc = {v: 0.0 for v in verts}
        for u, outs in outn.items():
            for w in outs:
                acc[w] += r[u] / len(outs)
        r = {v: 0.15 * p.get(v, 0.0) + 0.85 * acc[v] for v in verts}
    return r


def test_trustrank_matches_formula(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    seeds = spark.createDataFrame([(1,), (4,)], "id long")
    out, tri, pri = trustrank(spark, edges, seeds, max_steps=120, num_partitions=4)
    rows = {r["id"]: (r["trust"], r["spam_mass"]) for r in out.collect()}
    verts = sorted({v for e in EDGES for v in e})
    pr = _python_pagerank(EDGES, {v: 1.0 for v in verts})
    tr = _python_pagerank(EDGES, {1: 1.0, 4: 1.0})
    scale = len(verts) / 2.0
    assert set(rows) == set(verts)
    for v in verts:
        trust, mass = rows[v]
        assert math.isclose(trust, tr[v], abs_tol=1e-6)
        assert math.isclose(mass, 1.0 - scale * tr[v] / pr[v], abs_tol=1e-5)
    # seeds and their neighbourhood carry low spam mass; the seed-free
    # component {7, 8} gets the full mass 1
    assert rows[7][1] == pytest.approx(1.0, abs=1e-9)
    assert rows[8][1] == pytest.approx(1.0, abs=1e-9)
    assert rows[1][1] < 0.5


def test_trustrank_requires_in_graph_seed(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    seeds = spark.createDataFrame([(99,)], "id long")
    with pytest.raises(ValueError, match="no seed"):
        trustrank(spark, edges, seeds, max_steps=5)


def _python_levels(pairs):
    inn = {}
    verts = {v for e in pairs for v in e}
    for a, b in pairs:
        inn.setdefault(b, []).append(a)
    memo = {}

    def lvl(v):
        if v not in memo:
            memo[v] = 1 + max((lvl(u) for u in inn.get(v, [])), default=-1)
        return memo[v]

    return {v: lvl(v) for v in verts}


def test_dag_levels_longest_path(spark):
    pairs = [(1, 2), (2, 4), (1, 4), (4, 9), (3, 9), (5, 6), (1, 3), (3, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    out, info = dag_levels(spark, edges, num_partitions=4)
    got = {r["id"]: r["level"] for r in out.collect()}
    assert got == _python_levels(pairs)
    assert info.converged


def test_dag_levels_cycle_raises(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    with pytest.raises(ValueError, match="cycle"):
        dag_levels(spark, edges, max_steps=10, num_partitions=2)


def test_orient_acyclic_is_dag_input(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 2), (2, 3), (5, 5)], "src long, dst long"
    )
    got = {(r["src"], r["dst"]) for r in orient_acyclic(edges).collect()}
    assert got == {(1, 2), (2, 3)}


def _python_truss(pairs, k):
    e = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        nbrs = {}
        for a, b in e:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(nbrs[a] & nbrs[b]) for a, b in e
        }
        new_e = {p for p in e if sup[p] >= k - 2}
        if new_e == e:
            return {(a, b): sup[(a, b)] for a, b in e}
        e = new_e


def test_k_truss_matches_python(spark):
    # K4 on {1,2,3,4} + a triangle {4,5,6} + a pendant chain
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (4, 6), (6, 7), (7, 8),
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    for k in (3, 4, 5):
        out, info = k_truss(spark, edges, k, num_partitions=4)
        got = {(r["a"], r["b"]): r["support"] for r in out.collect()}
        assert got == _python_truss(pairs, k), f"k={k}"
        assert info.converged
    # the 4-truss is exactly the K4; the 5-truss is empty
    assert set(_python_truss(pairs, 4)) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert _python_truss(pairs, 5) == {}


def test_k_truss_rejects_small_k(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_truss(spark, edges, 2)


DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta epsilon"),
    (3, "alpha beta gamma delta"),
    (4, "zeta eta theta"),
    (5, "zeta eta theta iota kappa"),
    (6, "unrelated words entirely here"),
    (7, ""),
]


def _python_jaccard_pairs(docs, t):
    sets = {i: set(x for x in s.split(" ") if x) for i, s in docs}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= t:
                out[(a, b)] = j
    return out


@pytest.mark.parametrize("t", [0.5, 0.75, 1.0])
def test_prefix_jaccard_exact(spark, t):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = prefix_jaccard_pairs(docs, t)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    want = _python_jaccard_pairs(DOCS, t)
    assert got.keys() == want.keys()
    for p, j in want.items():
        assert math.isclose(got[p], j, rel_tol=1e-12)


def test_prefix_jaccard_releases_caches(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    prefix_jaccard_pairs(docs, 0.8).collect()
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(after) <= len(before) + 1  # only the localCheckpoint result


def test_inverted_index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(docs, min_df=2, top_postings=2).collect()
    }
    assert rows["alpha"] == (3, "1,2")  # capped at 2 postings
    assert rows["zeta"] == (2, "4,5")
    assert "epsilon" not in rows  # df = 1 < min_df
    full = {
        r["term"]: r["postings"] for r in inverted_index(docs, top_postings=10).collect()
    }
    assert full["alpha"] == "1,2,3"
    assert full["epsilon"] == "2"
