"""Neighborhood function / harmonic centrality: exact tier vs pure-
Python BFS, HyperBall (scale tier) vs the exact tier, determinism."""

from __future__ import annotations

import math
from collections import deque

from signal_collect_spark.algorithms.neighborhood import (
    distance_pairs,
    harmonic_centrality,
    hyperball_harmonic,
    neighborhood_function,
)

PAIRS = [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 6), (6, 7),
    (8, 9), (9, 10), (10, 8), (3, 7),
]


def _bfs_dists(pairs, directed=False):
    adj: dict[int, set[int]] = {}
    verts = set()
    for a, b in pairs:
        if a == b:
            continue
        verts.update((a, b))
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {}
    for s in verts:
        d = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in d:
                    d[y] = d[x] + 1
                    q.append(y)
        for u, dd in d.items():
            dist[(s, u)] = dd
    return dist, verts


def test_distance_pairs_exact(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    got = {
        (r["v"], r["u"]): r["dist"]
        for r in distance_pairs(spark, edges, 10).collect()
    }
    want, _ = _bfs_dists(PAIRS)
    assert got == want


def test_neighborhood_function_cumulative_and_flat_past_diameter(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    nf = {r["t"]: r["nf"] for r in neighborhood_function(spark, edges, 8).collect()}
    want, verts = _bfs_dists(PAIRS)
    for t in range(9):
        assert nf[t] == sum(1 for d in want.values() if d <= t), t
    assert nf[0] == len(verts)
    assert nf[8] == nf[7]  # diameter < 8: flat tail forward-filled


def test_harmonic_exact_undirected_and_directed(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, 10).collect()
    }
    want, verts = _bfs_dists(PAIRS)
    for v in verts:
        h = sum(1.0 / d for (s, u), d in want.items() if s == v and d > 0)
        assert math.isclose(got[v], h, rel_tol=1e-12), v

    # directed convention: harmonic(v) counts vertices that REACH v
    chain = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    gd = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, chain, 5, directed=True).collect()
    }
    assert math.isclose(gd[3], 1.0 + 0.5)  # 2 at d=1, 1 at d=2
    assert math.isclose(gd[2], 1.0)
    assert 1 not in gd or gd[1] == 0.0


def _ring_of_cliques(n_cliques=12, k=6):
    """Deterministic graph: 12 six-cliques joined in a ring (diameter
    large enough that balls grow over several supersteps)."""
    pairs = []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                pairs.append((base + i, base + j))
        nxt = ((c + 1) % n_cliques) * k
        pairs.append((base + k - 1, nxt))
    return pairs


def test_hyperball_tracks_exact_tier(spark):
    pairs = _ring_of_cliques()
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, info = hyperball_harmonic(spark, edges, p=6, max_t=16, num_partitions=4)
    rows = {r["id"]: (r["harmonic"], r["ball_est"]) for r in out.collect()}

    exact_h = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, 16).collect()
    }
    n = len(exact_h)
    assert set(rows) == set(exact_h)

    # aggregate accuracy: total ball mass ~= reachable pairs (everything
    # reachable here: n^2), total harmonic within HLL tolerance
    total_ball = sum(b for _, b in rows.values())
    assert abs(total_ball - n * n) / (n * n) < 0.25
    th_est = sum(h for h, _ in rows.values())
    th_exact = sum(exact_h.values())
    assert abs(th_est - th_exact) / th_exact < 0.25

    # register monotonicity made convergence exact: last round's sum
    # repeats, earlier rounds strictly increase
    sums = [s["register_sum"] for s in info.per_step]
    assert sums[-1] == sums[-2]
    assert all(a < b for a, b in zip(sums[:-2], sums[1:-1]))


def test_hyperball_deterministic(spark):
    pairs = _ring_of_cliques(6, 5)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    a, _ = hyperball_harmonic(spark, edges, p=5, max_t=12, num_partitions=4)
    b, _ = hyperball_harmonic(spark, edges, p=5, max_t=12, num_partitions=2)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_hyperball_no_cache_leak(spark):
    """Repo cache discipline (test_round4 convention): no DataFrame
    left in the CacheManager after the call returns. Per-round
    localCheckpoint RDDs are ContextCleaner-managed (freed when the
    superseded round's Python reference drops), same as the engine's
    truncation pattern — they are deliberately not counted here."""
    spark.catalog.clearCache()
    pairs = _ring_of_cliques(4, 4)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = hyperball_harmonic(spark, edges, p=4, max_t=8, num_partitions=2)
    out.count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "hyperball left DataFrames cached"
