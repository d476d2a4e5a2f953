"""The wider example-algorithm library (SURVEY.md §2.2) on the engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import fixtures as FX
from signal_collect_spark.algorithms.examples import (
    company_valuation,
    game_of_life,
    schelling_segregation,
    vertex_coloring,
)

OPTS = {"num_partitions": 4, "check_every": 4}


def test_company_valuation_fixpoint(spark):
    # A owns 50% of B's value flow; B owns 20% of A's.
    # v_A = core_A + 0.2 v_B ; v_B = core_B + 0.5 v_A
    edges = FX.edges_df(spark, [(1, 0, 0.2), (0, 1, 0.5)])
    core = spark.createDataFrame([(0, 100.0), (1, 50.0)], "id long, core_value double")
    state, info = company_valuation(spark, edges, core, converge_tol=1e-10, **OPTS)
    vals = {r["id"]: r["valuation"] for r in state.collect()}
    # solve: vA = 100 + 0.2 vB; vB = 50 + 0.5 vA -> vA = 110/0.9*... direct:
    va = (100 + 0.2 * 50) / (1 - 0.1)
    vb = 50 + 0.5 * va
    assert vals[0] == pytest.approx(va, abs=1e-6)
    assert vals[1] == pytest.approx(vb, abs=1e-6)


def _grid_neighbors_8(w, h):
    edges = []
    for y in range(h):
        for x in range(w):
            v = y * w + x
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < w and 0 <= ny < h:
                        edges.append((v, ny * w + nx))
    return edges


def test_game_of_life_blinker(spark):
    # vertical blinker in a 5x5 grid oscillates period 2
    w = 5
    edges = FX.edges_df(spark, _grid_neighbors_8(w, w))
    center = 2 * w + 2
    blinker = [center - w, center, center + w]
    alive = spark.createDataFrame([(i,) for i in blinker], "id long")
    s1, _ = game_of_life(spark, edges, alive, steps=1, **OPTS)
    a1 = {r["id"] for r in s1.collect() if r["alive"]}
    assert a1 == {center - 1, center, center + 1}  # horizontal
    s2, _ = game_of_life(spark, edges, alive, steps=2, **OPTS)
    a2 = {r["id"] for r in s2.collect() if r["alive"]}
    assert a2 == set(blinker)  # back to vertical


def test_schelling_flips_unhappy(spark):
    # K4 of type 1 + a type-0 agent attached to vertex 0: only the
    # attached agent is unhappy (0/1 same-type < 0.4) and flips; vertex
    # 0 stays (3/4 ≥ 0.4). Synchronous round semantics
    # (SchellingSegregation.scala:31-45).
    und = [(a, b) for a in range(4) for b in range(4) if a != b] + [(4, 0), (0, 4)]
    edges = FX.edges_df(spark, und)
    types = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 1), (4, 0)], "id long, type int"
    )
    state, _ = schelling_segregation(spark, edges, types, threshold=0.4, steps=1, **OPTS)
    got = {r["id"]: r["type"] for r in state.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}
    # stable afterwards
    state2, _ = schelling_segregation(spark, edges, types, threshold=0.4, steps=3, **OPTS)
    assert {r["id"]: r["type"] for r in state2.collect()} == got


def test_vertex_coloring_proper(spark):
    # the reference's verified property: no neighbour shares my colour
    # (IntegrationSpec.scala:166-194) on a 2x2 grid with 3 colours and
    # on a 5-cycle with 3 colours
    for pairs, colors in ((FX.grid(2, 2), 3), (FX.cycle(5) + [(b, a) for a, b in FX.cycle(5)], 3)):
        edges = FX.edges_df(spark, pairs)
        state, info = vertex_coloring(spark, edges, max_colors=colors, max_steps=30, **OPTS)
        assert info.converged, "colouring did not converge"
        col = {r["id"]: r["color"] for r in state.collect()}
        for a, b in pairs:
            if a != b:
                assert col[a] != col[b], (a, b, col)


def test_vertex_coloring_deterministic(spark):
    pairs = FX.grid(3, 3)
    edges = FX.edges_df(spark, pairs)
    a, _ = vertex_coloring(spark, edges, max_colors=4, max_steps=30, **OPTS)
    b, _ = vertex_coloring(spark, edges, max_colors=4, max_steps=30, **OPTS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
