"""Strongly connected components — checked against an iterative pure-
Python Tarjan."""

from __future__ import annotations

import pytest

from signal_collect_spark.algorithms.scc import strongly_connected_components


def _tarjan(pairs):
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        verts.update((a, b))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    ctr = [0]

    def strong(v):
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = ctr[0]
                ctr[0] += 1
                stack.append(node)
                on.add(node)
            recurse = False
            ns = adj.get(node, [])
            for i in range(pi, len(ns)):
                w = ns[i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                low[work[-1][0]] = min(low[work[-1][0]], low[node])

    for v in sorted(verts):
        if v not in index:
            strong(v)
    return out


CASES = {
    "two_cycles_bridge": [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 1)],
    "dag_chain": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "self_loops_and_pair": [(1, 1), (1, 2), (2, 1), (3, 3), (3, 4)],
    "bowtie": [(1, 2), (2, 3), (3, 1), (0, 1), (3, 9), (10, 0), (9, 11)],
    "nested_cycles": [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5), (5, 6), (6, 5), (6, 1)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_scc_matches_tarjan(spark, name):
    pairs = CASES[name]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, info = strongly_connected_components(spark, edges)
    got = {r["id"]: r["scc"] for r in out.collect()}
    assert got == _tarjan(pairs), name
    assert info.converged


def test_scc_random_graph_matches_tarjan(spark):
    # deterministic pseudo-random sparse digraph: cycles + tendrils
    pairs = []
    for i in range(60):
        pairs.append((i, (i * 7 + 3) % 60))
        if i % 4 == 0:
            pairs.append((i, (i * 13 + 1) % 60))
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = strongly_connected_components(spark, edges)
    got = {r["id"]: r["scc"] for r in out.collect()}
    assert got == _tarjan(pairs)


def test_scc_empty_and_round_guard(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out, info = strongly_connected_components(spark, empty)
    assert out.count() == 0 and info.converged
    # a 3-chain of singleton SCCs needs trim rounds; max_rounds=0 raises
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="max_rounds"):
        strongly_connected_components(spark, edges, max_rounds=0)
