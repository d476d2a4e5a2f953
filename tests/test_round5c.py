"""Round-5 additions (second batch): landmark distance sketches and
deterministic independent-cascade influence spread — each checked
against an independent pure-Python replica."""

from __future__ import annotations

import hashlib

import pytest

from signal_collect_spark.algorithms.cascade import independent_cascade
from signal_collect_spark.algorithms.landmarks import landmark_distances

FRAC = 1 << 40


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------
# landmark distances
# --------------------------------------------------------------------


def _py_bfs(adj, src, max_depth):
    dist = {src: 0}
    frontier = [src]
    d = 0
    while frontier and d < max_depth:
        d += 1
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return dist


def _adj(pairs, undirected=True):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if undirected:
            adj.setdefault(b, set()).add(a)
    return adj


PAIRS = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (6, 7), (8, 9)]


def test_landmarks_explicit_exact(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    lms = spark.createDataFrame([(1,), (8,)], "id long")
    out, info = landmark_distances(
        spark, edges, landmarks=lms, num_partitions=4
    )
    got = {(r["landmark"], r["id"]): r["dist"] for r in out.collect()}
    adj = _adj(PAIRS)
    for lm in (1, 8):
        want = _py_bfs(adj, lm, 16)
        assert {k[1]: v for k, v in got.items() if k[0] == lm} == want
    assert info.converged


def test_landmarks_hash_selection_replay(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    out, _ = landmark_distances(spark, edges, n_landmarks=3, num_partitions=4)
    verts = sorted({v for p in PAIRS for v in p})
    picked = sorted(verts, key=lambda v: (_h60(f"lmk|{v}"), v))[:3]
    got_lms = {r["landmark"] for r in out.collect()}
    assert got_lms == set(picked)


def test_landmarks_upper_bound_property(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    out, _ = landmark_distances(spark, edges, n_landmarks=3, num_partitions=4)
    rows = out.collect()
    by_vertex: dict[int, dict[int, int]] = {}
    for r in rows:
        by_vertex.setdefault(r["id"], {})[r["landmark"]] = r["dist"]
    adj = _adj(PAIRS)
    verts = sorted({v for p in PAIRS for v in p})
    for u in verts:
        true_d = _py_bfs(adj, u, 16)
        for v in verts:
            if v not in true_d:
                continue
            common = set(by_vertex.get(u, {})) & set(by_vertex.get(v, {}))
            if not common:
                continue
            bound = min(
                by_vertex[u][l] + by_vertex[v][l] for l in common
            )
            assert bound >= true_d[v]  # sketch bound never underestimates


def test_landmarks_max_depth_truncates(spark):
    chain = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    lms = spark.createDataFrame([(0,)], "id long")
    out, info = landmark_distances(
        spark, edges, landmarks=lms, max_depth=2, num_partitions=4
    )
    got = {r["id"]: r["dist"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert info.stop_reason == "max_steps"


# --------------------------------------------------------------------
# independent cascade
# --------------------------------------------------------------------


def _py_cascade(pairs, seeds, prob, max_rounds, seed="ic|"):
    live: dict[int, set[int]] = {}
    for a, b in set(pairs):
        if a == b:
            continue
        if (_h60(f"{seed}{a}|{b}") % FRAC) / float(FRAC) < prob:
            live.setdefault(a, set()).add(b)
    act = {s: 0 for s in seeds}
    frontier = list(seeds)
    r = 0
    while frontier and r < max_rounds:
        r += 1
        nxt = []
        for v in frontier:
            for w in live.get(v, ()):
                if w not in act:
                    act[w] = r
                    nxt.append(w)
        frontier = nxt
    return act


IC_PAIRS = [
    (1, 2), (2, 3), (3, 4), (1, 4), (4, 5), (5, 6),
    (2, 6), (6, 1), (3, 7), (7, 8), (8, 9), (9, 3),
]


def test_cascade_prob_one_is_reachability(spark):
    edges = spark.createDataFrame(IC_PAIRS, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    out, _ = independent_cascade(
        spark, edges, seeds=seeds, prob=1.0, num_partitions=4
    )
    got = {r["id"]: r["round"] for r in out.collect()}
    want = _py_cascade(IC_PAIRS, [1], 1.0, 16)
    assert got == want
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 8, 9}  # all reachable


def test_cascade_prob_zero_only_seeds(spark):
    edges = spark.createDataFrame(IC_PAIRS, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (7,)], "id long")
    out, info = independent_cascade(
        spark, edges, seeds=seeds, prob=0.0, num_partitions=4
    )
    got = {r["id"]: r["round"] for r in out.collect()}
    assert got == {1: 0, 7: 0}
    assert info.converged


def test_cascade_matches_python_replay(spark):
    edges = spark.createDataFrame(IC_PAIRS, "src long, dst long")
    verts = sorted({v for p in IC_PAIRS for v in p})
    picked = sorted(verts, key=lambda v: (_h60(f"ic|s|{v}"), v))[:3]
    out, _ = independent_cascade(
        spark, edges, n_seeds=3, prob=0.45, num_partitions=4
    )
    got = {r["id"]: r["round"] for r in out.collect()}
    assert got == _py_cascade(IC_PAIRS, picked, 0.45, 16)


def test_cascade_deterministic_across_runs(spark):
    edges = spark.createDataFrame(IC_PAIRS, "src long, dst long")
    a, _ = independent_cascade(spark, edges, n_seeds=2, prob=0.5, num_partitions=4)
    b, _ = independent_cascade(spark, edges, n_seeds=2, prob=0.5, num_partitions=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cascade_rejects_bad_params(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        independent_cascade(spark, edges, prob=1.5)
    with pytest.raises(ValueError):
        independent_cascade(spark, edges, n_seeds=0)
