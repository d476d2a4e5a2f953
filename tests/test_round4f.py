"""Temporal earliest-arrival reachability and WL color refinement vs
pure-Python references; callable edge_combine engine surface."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.temporal import earliest_arrival
from signal_collect_spark.algorithms.wl import wl_colors, wl_histogram

TEDGES = [  # (src, dst, contact time)
    (0, 1, 5.0), (1, 2, 3.0), (1, 2, 9.0), (0, 2, 20.0), (2, 3, 10.0),
    (3, 4, 8.0), (4, 5, 1.0), (0, 6, 1.0), (6, 3, 2.0), (9, 0, 50.0),
]


def _py_earliest(pairs, source, t0=0.0):
    verts = {v for a, b, _ in pairs for v in (a, b)}
    arr = {v: float("inf") for v in verts}
    arr[source] = t0
    changed = True
    while changed:
        changed = False
        for u, v, t in pairs:
            if t >= arr[u] and t < arr[v]:
                arr[v] = t
                changed = True
    return {v: (None if a == float("inf") else a) for v, a in arr.items()}


def test_earliest_arrival_matches_python(spark):
    edges = spark.createDataFrame(TEDGES, "src long, dst long, weight double")
    out, info = earliest_arrival(spark, edges, 0, num_partitions=4)
    got = {r["id"]: r["arrival"] for r in out.collect()}
    assert got == _py_earliest(TEDGES, 0)
    # time-respecting, not shortest-path: 0->1 at t=5 means the t=3
    # contact 1->2 is unusable; arrival(2) = 9 (not 3, not 20)
    assert got[2] == 9.0
    # 4->5 contact (t=1) precedes any arrival at 4 -> 5 unreachable
    assert got[5] is None
    # 9 never receives anything (its only contact is outgoing)
    assert got[9] is None
    assert info.converged


def test_callable_combine_rejected_in_csr(spark):
    from signal_collect_spark.algorithms.temporal import earliest_arrival_kernel
    from signal_collect_spark import graph as G
    from signal_collect_spark.superstep import run_supersteps

    edges = spark.createDataFrame(TEDGES, "src long, dst long, weight double")
    with pytest.raises(ValueError, match="callable edge_combine"):
        run_supersteps(
            spark, edges, G.vertices_from_edges(edges),
            earliest_arrival_kernel(0, 0.0), mode="csr", max_steps=2,
        )


WLE = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6), (6, 7), (7, 5), (7, 8)]


def _py_wl(pairs, rounds):
    und = {(a, b) for a, b in pairs if a != b} | {(b, a) for a, b in pairs if a != b}
    nbrs: dict[int, list[int]] = {}
    verts = set()
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        verts.update((a, b))
    color = {v: "0" for v in verts}
    for _ in range(rounds):
        color = {
            v: hashlib.md5(
                f"{color[v]}|{','.join(sorted(color[u] for u in nbrs[v]))}".encode()
            ).hexdigest()
            for v in verts
        }
    return color


@pytest.mark.parametrize("rounds", [1, 3])
def test_wl_matches_python(spark, rounds):
    edges = spark.createDataFrame(WLE, "src long, dst long")
    out, info = wl_colors(spark, edges, rounds=rounds, num_partitions=4)
    got = {r["id"]: r["color"] for r in out.collect()}
    assert got == _py_wl(WLE, rounds)
    assert info.supersteps == rounds


def test_wl_separates_isomorphic_positions(spark):
    # the two triangles {1,2,3} / {5,6,7} are isomorphic with 4 and 8
    # pendant on 3 and 7 — WL must give mirrored vertices equal colors
    # and structurally distinct vertices different ones
    edges = spark.createDataFrame(WLE, "src long, dst long")
    out, _ = wl_colors(spark, edges, rounds=3, num_partitions=4)
    got = {r["id"]: r["color"] for r in out.collect()}
    assert got[1] == got[2] == got[5] == got[6]
    assert got[3] == got[7]
    assert got[4] == got[8]
    assert len({got[1], got[3], got[4]}) == 3
    hist = {r["color"]: r["n_vertices"] for r in wl_histogram(out).collect()}
    assert sorted(hist.values()) == [2, 2, 4]
