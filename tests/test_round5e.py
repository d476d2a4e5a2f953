"""Round-5 additions (fourth batch): sampled-source closeness and the
HADI effective-diameter summary — each checked against an independent
pure-Python BFS replica."""

from __future__ import annotations

import hashlib

import pytest

from signal_collect_spark.algorithms.landmarks import closeness_topk
from signal_collect_spark.algorithms.neighborhood import effective_diameter


def _hash60(s: str) -> int:
    # pure-Python replica of data/hashing.portable_hash60
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bfs(adj, s):
    dist = {s: 0}
    frontier = [s]
    while frontier:
        nxt = []
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    nxt.append(w)
        frontier = nxt
    return dist


def _adj(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


# path 0-1-2-3-4 plus a pendant 5 off vertex 2: center 2 wins closeness
CLS_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5)]


def _py_closeness(pairs, n_sources, seed="cls|"):
    adj = _adj(pairs)
    verts = sorted(adj)
    pivots = sorted(verts, key=lambda v: (_hash60(f"{seed}{v}"), v))[:n_sources]
    dists = {p: _bfs(adj, p) for p in pivots}
    out = {}
    for v in verts:
        ds = [dists[p].get(v) for p in pivots]
        if any(d is None for d in ds):
            continue
        s = sum(ds)
        if s > 0:
            out[v] = (s, round(n_sources / s, 9))
    return out


def test_closeness_matches_replica_and_ranks_center_first(spark):
    edges = spark.createDataFrame(CLS_EDGES, "src long, dst long")
    rows = closeness_topk(spark, edges, k=10, n_sources=3).collect()
    want = _py_closeness(CLS_EDGES, 3)
    got = {r["id"]: (r["sum_dist"], r["closeness"]) for r in rows}
    assert got == want
    # top row is the best-scoring vertex of the replica
    best = max(want.items(), key=lambda kv: (kv[1][1], -kv[0]))[0]
    assert rows[0]["id"] == best


def test_closeness_excludes_unreached_vertices(spark):
    # two components: pivots land in one of them; the other never
    # reaches all pivots and must not appear
    pairs = CLS_EDGES + [(100, 101)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = closeness_topk(spark, edges, k=20, n_sources=3).collect()
    want = _py_closeness(pairs, 3)
    assert {r["id"] for r in rows} == set(want)


def test_closeness_topk_cut(spark):
    edges = spark.createDataFrame(CLS_EDGES, "src long, dst long")
    rows = closeness_topk(spark, edges, k=2, n_sources=3).collect()
    want = sorted(
        _py_closeness(CLS_EDGES, 3).items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:2]
    assert [(r["id"], r["sum_dist"], r["closeness"]) for r in rows] == [
        (v, s, c) for v, (s, c) in want
    ]


# ---------------------------------------------------------------------
# effective diameter
# ---------------------------------------------------------------------


def _py_effdiam(pairs, max_t, q=0.9):
    adj = _adj(pairs)
    verts = sorted(adj)
    cnt: dict[int, int] = {}
    for v in verts:
        for d in _bfs(adj, v).values():
            if d <= max_t:
                cnt[d] = cnt.get(d, 0) + 1
    nf = []
    run = 0
    for t in range(max_t + 1):
        run += cnt.get(t, 0)
        nf.append(run)
    total = nf[-1]
    d_q = next(t for t in range(max_t + 1) if nf[t] >= q * total)
    if d_q == 0:
        interp = 0.0
    else:
        interp = d_q - 1 + (q * total - nf[d_q - 1]) / (nf[d_q] - nf[d_q - 1])
    pairs_ge1 = [(t, cnt.get(t, 0)) for t in range(1, max_t + 1)]
    s = sum(t * c for t, c in pairs_ge1)
    n = sum(c for _, c in pairs_ge1)
    return total, d_q, round(interp, 6), round(s / n, 6)


def test_effective_diameter_path_graph(spark):
    pairs = [(i, i + 1) for i in range(9)]  # path of 10 vertices
    edges = spark.createDataFrame(pairs, "src long, dst long")
    row = effective_diameter(spark, edges, 9).first()
    total, d_q, interp, mean_d = _py_effdiam(pairs, 9)
    assert row["n_pairs"] == total == 100
    assert row["d_q"] == d_q
    assert row["d_q_interp"] == pytest.approx(interp, abs=1e-6)
    assert row["mean_dist"] == pytest.approx(mean_d, abs=1e-6)


def test_effective_diameter_star_is_two(spark):
    pairs = [(0, i) for i in range(1, 21)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    row = effective_diameter(spark, edges, 4).first()
    total, d_q, interp, mean_d = _py_effdiam(pairs, 4)
    assert (row["n_pairs"], row["d_q"]) == (total, d_q) == (441, 2)
    assert row["d_q_interp"] == pytest.approx(interp, abs=1e-6)
    assert row["mean_dist"] == pytest.approx(mean_d, abs=1e-6)


def test_effective_diameter_q1_is_diameter(spark):
    pairs = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    row = effective_diameter(spark, edges, 8, q=1.0).first()
    assert row["d_q"] == 5  # path diameter
    assert row["d_q_interp"] == pytest.approx(5.0, abs=1e-6)


def test_effective_diameter_validates_q(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        effective_diameter(spark, edges, 2, q=0.0)
