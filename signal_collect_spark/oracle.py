"""Pure-numpy reference oracles — literal implementations of the
reference's collect/signal formulas iterated to fixpoint, used for
differential testing (the reference's own pattern: util/Verifier.scala:31-69
runs two implementations side by side and throws on divergence).

These are intentionally SIMPLE and SLOW (dense driver-side loops) —
they exist only to certify the distributed engine on small graphs.
"""

from __future__ import annotations

import numpy as np


def _relabel(edges: list[tuple[int, int]] | list[tuple[int, int, float]]):
    ids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(ids)}
    trip = [(idx[e[0]], idx[e[1]], float(e[2]) if len(e) > 2 else 1.0) for e in edges]
    return ids, trip


def pagerank_oracle(
    edges, damping: float = 0.85, tol: float = 1e-12, max_iter: int = 10_000
) -> dict[int, float]:
    """Literal PageRankVertex fixpoint (examples/PageRank.scala:39,49,57):
    r = (1−d) + d · Σ_in r(u)·w/Σw(u); dangling vertices never emit,
    no mass redistribution; base value (1−d) = 0.15."""
    ids, trip = _relabel(edges)
    n = len(ids)
    out_w = np.zeros(n)
    for s, _, w in trip:
        out_w[s] += w
    r = np.full(n, 1.0 - damping)
    for _ in range(max_iter):
        acc = np.zeros(n)
        for s, d, w in trip:
            acc[d] += r[s] * w / out_w[s]
        new = (1.0 - damping) + damping * acc
        if np.max(np.abs(new - r)) < tol:
            r = new
            break
        r = new
    return {ids[i]: float(r[i]) for i in range(n)}


def cc_oracle(edges) -> dict[int, int]:
    """Undirected connected components; component = min id (exact)."""
    ids, trip = _relabel(edges)
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in trip:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # min id per component (ids sorted ⇒ root index = min index ⇒ min id)
    return {ids[i]: ids[find(i)] for i in range(len(ids))}


def sssp_oracle(edges, source: int) -> dict[int, float | None]:
    """Dijkstra over the directed weighted graph; None = unreachable
    (reference semantics Sssp.scala:64-69, min-fold, Option state)."""
    import heapq

    ids, trip = _relabel(edges)
    idx = {v: i for i, v in enumerate(ids)}
    adj: list[list[tuple[int, float]]] = [[] for _ in ids]
    for s, d, w in trip:
        adj[s].append((d, w))
    dist = {i: None for i in range(len(ids))}
    if source in idx:
        h = [(0.0, idx[source])]
        while h:
            dv, v = heapq.heappop(h)
            if dist[v] is not None:
                continue
            dist[v] = dv
            for u, w in adj[v]:
                if dist[u] is None:
                    heapq.heappush(h, (dv + w, u))
    return {ids[i]: dist[i] for i in range(len(ids))}


def label_propagation_oracle(edges, rounds: int, directed: bool = False) -> dict[int, int]:
    """Synchronous Chinese-Whispers rounds with the pinned tie-break
    (max summed weight, ties → smallest label); self-preference
    (own label, 1.0) per ChineseWhispersClustering.scala:35-42."""
    ids, trip = _relabel(edges)
    if not directed:
        m: dict[tuple[int, int], float] = {}
        for s, d, w in trip:
            m[(s, d)] = max(m.get((s, d), w), w)
            m[(d, s)] = max(m.get((d, s), w), w)
        trip = [(s, d, w) for (s, d), w in m.items()]
    in_adj: dict[int, list[tuple[int, float]]] = {i: [] for i in range(len(ids))}
    for s, d, w in trip:
        in_adj[d].append((s, w))
    label = list(range(len(ids)))
    for _ in range(rounds):
        new = list(label)
        for v in range(len(ids)):
            scores: dict[int, float] = {label[v]: 1.0}
            for u, w in in_adj[v]:
                scores[label[u]] = scores.get(label[u], 0.0) + w
            best = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return {ids[i]: ids[label[i]] for i in range(len(ids))}


def triangles_oracle(edges) -> tuple[int, dict[int, int]]:
    """(global triangle count, per-vertex incident triangle count) on the
    undirected simple graph."""
    ids, trip = _relabel(edges)
    nbrs: dict[int, set[int]] = {i: set() for i in range(len(ids))}
    for s, d, _ in trip:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    count = 0
    per = {i: 0 for i in range(len(ids))}
    n = len(ids)
    for a in range(n):
        for b in nbrs[a]:
            if b <= a:
                continue
            for c in nbrs[a] & nbrs[b]:
                if c > b:
                    count += 1
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
    return count, {ids[i]: per[i] for i in range(n)}
