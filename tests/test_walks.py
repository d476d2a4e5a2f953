"""Deterministic random walks — checked against an independent pure-
Python replay of the (seed, walk, step, vertex) → md5-60 hop rule."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.walks import random_walks


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(pairs, walk_len, walks_per_vertex, seed="walk|"):
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in set(pairs):
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        verts.update((a, b))
    for v in adj:
        adj[v].sort()
    out = []
    for v0 in verts:
        for w in range(walks_per_vertex):
            cur = v0
            out.append((v0, w, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_h60(f"{seed}{w}|{t}|{cur}") % len(nbrs)]
                out.append((v0, w, t, cur))
    return sorted(out)


PAIRS = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 1), (2, 4), (5, 1)]


def test_walks_match_python_replay(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    out, info = random_walks(spark, edges, walk_len=4, walks_per_vertex=3)
    got = sorted(tuple(r) for r in out.collect())
    assert got == _py_walks(PAIRS, 4, 3)
    assert info.supersteps == 4


def test_walks_stop_at_dead_ends(spark):
    # 1 -> 2 -> 3, vertex 3 has no out-edges: every walk ends there
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out, _ = random_walks(spark, edges, walk_len=5, walks_per_vertex=1)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == _py_walks([(1, 2), (2, 3)], 5, 1)
    # walk from 3 contributes only its step-0 row; no padding past step 2
    assert max(r[2] for r in rows) == 2
    assert sum(1 for r in rows if r[0] == 3) == 1


def test_walks_starts_subset_and_cache_release(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    starts = spark.createDataFrame([(1,), (4,)], "id long")
    spark.catalog.clearCache()
    out, _ = random_walks(spark, edges, walk_len=2, walks_per_vertex=2, starts=starts)
    rows = out.collect()
    assert {r["start_id"] for r in rows} == {1, 4}
    expect = [r for r in _py_walks(PAIRS, 2, 2) if r[0] in (1, 4)]
    assert sorted(tuple(r) for r in rows) == expect
    # the packed-adjacency persist is released once the result is out
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_walks_max_degree_guard(spark):
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    with pytest.raises(ValueError, match="max_degree"):
        random_walks(spark, edges, walk_len=1, max_degree=3)


def test_walks_xxhash_path_valid_edges(spark):
    """Fast-path hash still produces walks that follow real edges."""
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    out, _ = random_walks(spark, edges, walk_len=3, hash_fn="xxhash64")
    eset = set(PAIRS)
    rows = sorted(tuple(r) for r in out.collect())
    by_walk: dict[tuple, list] = {}
    for sid, w, t, v in rows:
        by_walk.setdefault((sid, w), []).append((t, v))
    for (sid, _), seq in by_walk.items():
        seq.sort()
        assert seq[0] == (0, sid)
        for (t0, a), (t1, b) in zip(seq, seq[1:]):
            assert t1 == t0 + 1 and (a, b) in eset


def _py_weighted_walks(tri, walk_len, walks_per_vertex, seed="walk|"):
    from signal_collect_spark.algorithms.walks import FRAC_MOD

    adj: dict[int, list[tuple[int, float]]] = {}
    verts = set()
    agg: dict[tuple, float] = {}
    for a, b, w in tri:
        if a == b:
            continue
        agg[(a, b)] = agg.get((a, b), 0.0) + w
        verts.update((a, b))
    for (a, b), w in agg.items():
        adj.setdefault(a, []).append((b, w))
    for v in adj:
        adj[v].sort()
    out = []
    for v0 in verts:
        for wk in range(walks_per_vertex):
            cur = v0
            out.append((v0, wk, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cum, s = [], 0.0
                for _, w in nbrs:
                    s += w
                    cum.append(s)
                thr = (_h60(f"{seed}{wk}|{t}|{cur}") % FRAC_MOD) / FRAC_MOD * cum[-1]
                idx = min(len(nbrs), sum(1 for c in cum if c <= thr) + 1)
                cur = nbrs[idx - 1][0]
                out.append((v0, wk, t, cur))
    return sorted(out)


WPAIRS = [(1, 2, 1.0), (1, 3, 4.0), (2, 3, 2.0), (3, 1, 1.0), (3, 4, 3.0),
          (4, 1, 5.0), (2, 4, 1.0), (2, 4, 0.5)]  # parallel edge: weights sum


def test_weighted_walks_match_python_replay(spark):
    edges = spark.createDataFrame(WPAIRS, "src long, dst long, weight double")
    out, info = random_walks(
        spark, edges, walk_len=4, walks_per_vertex=3, weight_col="weight"
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == _py_weighted_walks(WPAIRS, 4, 3)
    assert info.supersteps == 4


def test_weighted_walks_follow_heavy_edges(spark):
    # vertex 0 has one overwhelming edge (w=1e6) and 9 w=1 edges: the
    # deterministic fraction lands in the heavy edge's cum span for the
    # vast majority of (walk, step) hashes
    tri = [(0, 1, 1e6)] + [(0, i, 1.0) for i in range(2, 11)] + [(i, 0, 1.0) for i in range(1, 11)]
    edges = spark.createDataFrame(tri, "src long, dst long, weight double")
    out, _ = random_walks(
        spark, edges, walk_len=1, walks_per_vertex=50,
        starts=spark.createDataFrame([(0,)], "id long"), weight_col="weight",
    )
    hops = [r["vertex"] for r in out.collect() if r["step"] == 1]
    assert len(hops) == 50 and hops.count(1) >= 48
