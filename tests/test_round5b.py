"""Round-5 additions: sampled-source Brandes betweenness, node2vec
biased walks, multinomial Naive Bayes — each checked against an
independent pure-Python replica."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.betweenness import betweenness
from signal_collect_spark.algorithms.walks import node2vec_walks
from signal_collect_spark.data.classify import (
    naive_bayes_classify,
    naive_bayes_train,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------
# betweenness
# --------------------------------------------------------------------


def _py_brandes(pairs, sources, undirected=True):
    """Textbook Brandes (2001) — independent of the Spark code path."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if undirected:
            adj.setdefault(b, set()).add(a)
    bc: dict[int, float] = {}
    for s in sources:
        if s not in adj:
            continue
        sigma = {s: 1.0}
        dist = {s: 0}
        order = [s]
        frontier = [s]
        while frontier:
            nxt = []
            for v in frontier:
                for w in sorted(adj.get(v, ())):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        sigma[w] = 0.0
                        nxt.append(w)
                        order.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
            frontier = nxt
        delta = {v: 0.0 for v in order}
        # accumulate via successor scan (matches the engine's join)
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] = bc.get(w, 0.0) + delta[w]
    if undirected:
        bc = {v: x / 2.0 for v, x in bc.items()}
    return bc


PATH4 = [(0, 1), (1, 2), (2, 3)]


def test_betweenness_path_graph_exact(spark):
    edges = spark.createDataFrame(PATH4, "src long, dst long")
    srcs = spark.createDataFrame([(i,) for i in range(4)], "id long")
    out, info = betweenness(spark, edges, sources=srcs, num_partitions=4)
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    # middle vertices each sit on 2 of the 6 unordered pairs
    assert got[1] == pytest.approx(2.0)
    assert got[2] == pytest.approx(2.0)
    assert got[0] == pytest.approx(0.0)
    assert got[3] == pytest.approx(0.0)
    assert info.converged


def test_betweenness_star_center(spark):
    pairs = [(0, 1), (0, 2), (0, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    srcs = spark.createDataFrame([(i,) for i in range(4)], "id long")
    out, _ = betweenness(spark, edges, sources=srcs, num_partitions=4)
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got[0] == pytest.approx(3.0)  # all 3 leaf pairs route via hub
    for leaf in (1, 2, 3):
        assert got[leaf] == pytest.approx(0.0)


def test_betweenness_matches_python_brandes(spark):
    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 1),
        (1, 3), (2, 6), (6, 7), (7, 3), (5, 8),
    ]
    verts = sorted({v for p in pairs for v in p})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    srcs = spark.createDataFrame([(v,) for v in verts], "id long")
    out, _ = betweenness(spark, edges, sources=srcs, num_partitions=4)
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    want = _py_brandes(pairs, verts)
    for v in verts:
        assert got.get(v, 0.0) == pytest.approx(want.get(v, 0.0), abs=1e-9)


def test_betweenness_sampled_sources_deterministic(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    a, _ = betweenness(spark, edges, n_sources=2, num_partitions=4)
    b, _ = betweenness(spark, edges, n_sources=2, num_partitions=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # replay: which 2 sources does the hash order pick?
    verts = sorted({v for p in pairs for v in p})
    picked = sorted(verts, key=lambda v: (_h60(f"btw|{v}"), v))[:2]
    want = _py_brandes(pairs, picked)
    got = {r["id"]: r["betweenness"] for r in a.collect()}
    for v in verts:
        assert got.get(v, 0.0) == pytest.approx(want.get(v, 0.0), abs=1e-9)


def test_betweenness_directed(spark):
    # directed path 0->1->2: only s=0 routes through 1 (to reach 2)
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    srcs = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    out, _ = betweenness(
        spark, edges, sources=srcs, undirected=False, num_partitions=4
    )
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert got[1] == pytest.approx(1.0)
    assert got.get(0, 0.0) == pytest.approx(0.0)
    assert got[2] == pytest.approx(0.0)


# --------------------------------------------------------------------
# node2vec walks
# --------------------------------------------------------------------

FRAC = 1 << 40


def _py_node2vec(pairs, walk_len, walks_per_vertex, p, q, seed="n2v|"):
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in set(pairs):
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        verts.update((a, b))
    for v in adj:
        adj[v].sort()
    ret_w, out_w = 1.0 / p, 1.0 / q
    out = []
    for v0 in sorted(verts):
        for w in range(walks_per_vertex):
            cur, prev = v0, None
            out.append((v0, w, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = _h60(f"{seed}{w}|{t}|{cur}")
                if t == 1:
                    nxt = nbrs[h % len(nbrs)]
                else:
                    pn = set(adj.get(prev, ()))
                    alphas = [
                        ret_w if n == prev else (1.0 if n in pn else out_w)
                        for n in nbrs
                    ]
                    thresh = (h % FRAC) / float(FRAC) * sum(alphas)
                    cum, cnt = 0.0, 0
                    for x in alphas:
                        cum += x
                        if cum <= thresh:
                            cnt += 1
                    nxt = nbrs[min(len(nbrs), cnt + 1) - 1]
                out.append((v0, w, t, nxt))
                prev, cur = cur, nxt
    return sorted(out)


N2V_PAIRS = [
    (1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 1),
    (2, 4), (5, 1), (4, 5), (5, 2),
]


def test_node2vec_matches_python_replay(spark):
    edges = spark.createDataFrame(N2V_PAIRS, "src long, dst long")
    out, info = node2vec_walks(
        spark, edges, walk_len=4, walks_per_vertex=3, p=2.0, q=0.5
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == _py_node2vec(N2V_PAIRS, 4, 3, 2.0, 0.5)
    assert info.supersteps == 4


def test_node2vec_other_pq(spark):
    edges = spark.createDataFrame(N2V_PAIRS, "src long, dst long")
    out, _ = node2vec_walks(
        spark, edges, walk_len=3, walks_per_vertex=2, p=4.0, q=0.25
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == _py_node2vec(N2V_PAIRS, 3, 2, 4.0, 0.25)


def test_node2vec_rejects_bad_params(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        node2vec_walks(spark, edges, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(spark, edges, q=-1.0)


def test_node2vec_dead_end_stops(spark):
    # 1 -> 2 (2 has no out-edges): every walk from 1 halts at step 1
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out, _ = node2vec_walks(spark, edges, walk_len=3, walks_per_vertex=1)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, 0, 0, 1), (1, 0, 1, 2), (2, 0, 0, 2)]


# --------------------------------------------------------------------
# naive bayes
# --------------------------------------------------------------------


def test_naive_bayes_separates_languages(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "en"),
            (2, "the dog sat", "en"),
            (3, "the bird flew", "en"),
            (4, "le chat noir", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    cs, tl = naive_bayes_train(docs, label_col="lang")
    test = spark.createDataFrame(
        [(10, "the cat flew"), (11, "le chat")], "doc_id long, text string"
    )
    pred = {r["id"]: r["pred"] for r in naive_bayes_classify(test, cs, tl).collect()}
    assert pred[10] == "en"
    assert pred[11] == "fr"


def test_naive_bayes_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "b c", "y")],
        "doc_id long, text string, lang string",
    )
    cs, tl = naive_bayes_train(docs, label_col="lang", smoothing=1.0)
    test = spark.createDataFrame([(7, "a c")], "doc_id long, text string")
    row = naive_bayes_classify(test, cs, tl).collect()[0]
    # V=3; x: tot=3, P(a|x)=(2+1)/(3+3), P(c|x)=(0+1)/6; prior 1/2
    sx = math.log(0.5) + math.log(3 / 6) + math.log(1 / 6)
    # y: tot=2, P(a|y)=1/5, P(c|y)=2/5
    sy = math.log(0.5) + math.log(1 / 5) + math.log(2 / 5)
    want_label = "x" if sx >= sy else "y"
    assert row["pred"] == want_label
    assert row["score"] == pytest.approx(round(max(sx, sy), 6), abs=1e-6)


def test_naive_bayes_unseen_tokens_fall_back_to_prior(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "x"), (2, "a b", "x"), (3, "a b", "x"), (4, "c d", "y")],
        "doc_id long, text string, lang string",
    )
    cs, tl = naive_bayes_train(docs, label_col="lang")
    test = spark.createDataFrame([(9, "zzz qqq")], "doc_id long, text string")
    row = naive_bayes_classify(test, cs, tl).collect()[0]
    # all tokens unseen under both labels; x has 6 tokens, y has 2, so
    # the floor a/(tot + aV) is LARGER for y... but the 3:1 prior and
    # the per-token floors both matter — replicate exactly:
    V = 4
    sx = math.log(3 / 4) + 2 * math.log(1 / (6 + V))
    sy = math.log(1 / 4) + 2 * math.log(1 / (2 + V))
    want = "x" if sx >= sy else ("y" if sy > sx else "x")
    assert row["pred"] == want


def test_naive_bayes_tie_breaks_on_smaller_label(spark):
    # perfectly symmetric corpus -> exact score tie on a symmetric doc
    docs = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")],
        "doc_id long, text string, lang string",
    )
    cs, tl = naive_bayes_train(docs, label_col="lang")
    test = spark.createDataFrame([(5, "zzz")], "doc_id long, text string")
    row = naive_bayes_classify(test, cs, tl).collect()[0]
    assert row["pred"] == "x"


def test_naive_bayes_rejects_bad_smoothing(spark):
    docs = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError):
        naive_bayes_train(docs, label_col="lang", smoothing=0.0)
