"""Sudoku as constraint propagation over the 81-cell peer graph.

Reference semantics (examples/Sudoku.scala:33-62): each cell vertex
holds Option[Int]; `SudokuAssociation` edges connect every cell to its
20 peers (same row, column, or 3x3 box) and signal the source's state;
`collect` removes the determined peer values from the cell's candidate
set and fixes the cell when ONE candidate remains (naked single).
When propagation stalls before solving, the reference's driver runs a
depth-first search over the remaining candidates
(`Sudoku.scala:96-100` tryPossibilities / `:129-150`), i.e. search is
explicitly OUTSIDE the vertex engine there too.

Spark-first re-expression: the candidate sets are one DataFrame
(cell, cand) and a propagation round is two joins —
  eliminate:  candidates minus (peer join determined-values)
  promote:    cells whose candidate count hits 1 become determined
— iterated to fixpoint (no change ≙ the engine's no-signals-scored
termination). The DFS fallback mirrors the reference: driver-side,
over the (tiny: ≤81*9) collected candidate table, re-using the same
propagation rule in pure Python.

The peer topology is 81*20 static edges; data volume is trivial — the
value here is conformance (a reference user can run their Sudoku) and
a worked example of set-subtraction collect semantics on the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _peers() -> list[tuple[int, int]]:
    """The SudokuAssociation edge list: (cell, peer) for all cells
    sharing a row, column, or box — 81*20 directed edges."""
    out = []
    for a in range(81):
        ra, ca = divmod(a, 9)
        for b in range(81):
            if a == b:
                continue
            rb, cb = divmod(b, 9)
            if ra == rb or ca == cb or (ra // 3 == rb // 3 and ca // 3 == cb // 3):
                out.append((a, b))
    return out


def _propagate(cands: dict[int, set[int]]) -> dict[int, set[int]] | None:
    """Driver-side naked-single propagation to fixpoint on plain dicts
    (the reference's collect rule); None on contradiction."""
    peers: dict[int, list[int]] = {}
    for a, b in _peers():
        peers.setdefault(a, []).append(b)
    changed = True
    while changed:
        changed = False
        for c, s in cands.items():
            if len(s) == 1:
                v = next(iter(s))
                for p in peers[c]:
                    if v in cands[p]:
                        if len(cands[p]) == 1:
                            # two determined peers share a value — a
                            # contradiction the search must reject
                            return None
                        cands[p] = cands[p] - {v}
                        if len(cands[p]) == 0:
                            return None
                        changed = True
    if any(len(s) == 0 for s in cands.values()):
        return None
    return cands


def _dfs(cands: dict[int, set[int]]) -> dict[int, int] | None:
    cands = _propagate({c: set(s) for c, s in cands.items()})
    if cands is None:
        return None
    undecided = [c for c, s in cands.items() if len(s) > 1]
    if not undecided:
        return {c: next(iter(s)) for c, s in cands.items()}
    cell = min(undecided, key=lambda c: len(cands[c]))
    for v in sorted(cands[cell]):
        trial = {c: set(s) for c, s in cands.items()}
        trial[cell] = {v}
        solved = _dfs(trial)
        if solved is not None:
            return solved
    return None


def sudoku(
    spark,
    givens: dict[int, int],
    max_steps: int = 30,
    search_fallback: bool = True,
) -> DataFrame:
    """Solve a Sudoku given as {cell_id: value} (cell 0 top-left … 80
    bottom-right, Sudoku.scala:43). Returns DF (cell int, value int).

    Distributed naked-single propagation rounds run first (the
    reference's vertex collect); if the grid is not fully determined
    at fixpoint and ``search_fallback``, the remaining candidates are
    collected (≤ 729 rows) and the reference's driver-side DFS
    finishes the job. Raises on unsolvable input.
    """
    peers = spark.createDataFrame(_peers(), "cell int, peer int")
    cands = spark.createDataFrame(
        [
            (c, v)
            for c in range(81)
            for v in ([givens[c]] if c in givens else range(1, 10))
        ],
        "cell int, cand int",
    ).persist()

    n_prev = cands.count()
    for _ in range(max_steps):
        # determined cells = exactly one candidate left (naked single)
        det = (
            cands.groupBy("cell")
            .agg(F.count("*").alias("n"), F.min("cand").alias("value"))
            .filter("n = 1")
            .select("cell", "value")
        )
        # eliminate: candidate v at cell c dies if any peer is determined v
        kill = (
            peers.join(det, peers["peer"] == det["cell"])
            .select(peers["cell"].alias("kcell"), F.col("value").alias("kcand"))
            .distinct()
        )
        nxt = (
            cands.join(
                kill,
                (cands["cell"] == kill["kcell"]) & (cands["cand"] == kill["kcand"]),
                "left_anti",
            )
            # a determined cell keeps its own value even if a (buggy
            # duplicate-given) peer shares it — matches the reference,
            # whose collect never empties a size-1 set
            .unionAll(cands.join(det.select("cell"), "cell", "left_semi"))
            .distinct()
            # truncate lineage EVERY round: the chained join/union plan
            # otherwise grows until Catalyst's plan rendering alone OOMs
            # (same trap as star CC — components.py)
            .localCheckpoint()
        )
        # ONE action per round (r3 verdict nit #4: a second count() on
        # cands doubled the round barriers) — the prior round's count is
        # already known
        n_after = nxt.count()
        cands.unpersist()
        cands = nxt
        if n_after == n_prev:
            break
        n_prev = n_after

    per_cell = {c: set() for c in range(81)}
    for r in cands.collect():
        per_cell[r["cell"]].add(r["cand"])
    cands.unpersist()
    if any(len(s) == 0 for s in per_cell.values()):
        raise ValueError("unsolvable sudoku (contradiction during propagation)")
    if all(len(s) == 1 for s in per_cell.values()):
        solved = {c: next(iter(s)) for c, s in per_cell.items()}
    elif search_fallback:
        solved = _dfs(per_cell)
        if solved is None:
            raise ValueError("unsolvable sudoku (search exhausted)")
    else:
        raise ValueError("propagation stalled; rerun with search_fallback=True")
    # final validity gate (ADVICE r3): contradictory GIVENS that leave no
    # undecided cell (e.g. a complete grid with a duplicate in one row)
    # sail through propagation with every cell "determined" — the
    # contradiction branches never run. Every row/column/box must be a
    # permutation of 1..9.
    full = set(range(1, 10))
    units = [[r * 9 + c for c in range(9)] for r in range(9)]
    units += [[r * 9 + c for r in range(9)] for c in range(9)]
    units += [
        [(br + r) * 9 + (bc + c) for r in range(3) for c in range(3)]
        for br in (0, 3, 6)
        for bc in (0, 3, 6)
    ]
    if any({solved[c] for c in u} != full for u in units):
        raise ValueError("unsolvable sudoku (givens violate a row/column/box)")
    return spark.createDataFrame(sorted(solved.items()), "cell int, value int")


SUDOKU1 = {
    4: 9, 5: 6, 8: 5, 10: 9, 11: 4, 13: 2, 14: 1, 15: 8, 16: 6, 19: 1,
    21: 4, 24: 3, 25: 2, 29: 3, 31: 4, 34: 7, 36: 1, 38: 6, 42: 4,
    44: 2, 46: 4, 49: 6, 51: 5, 55: 5, 56: 2, 59: 4, 61: 1, 64: 6,
    65: 1, 66: 2, 67: 3, 69: 7, 70: 8, 72: 4, 75: 8, 76: 1,
}
"""The reference's sudoku1 seed (Sudoku.scala:68-73)."""

SUDOKU2 = {
    0: 9, 8: 4, 11: 5, 13: 3, 15: 8, 16: 9, 21: 6, 24: 2, 28: 9,
    31: 8, 33: 3, 35: 7, 38: 1, 42: 4, 45: 7, 47: 3, 49: 2, 52: 8,
    56: 9, 59: 6, 64: 7, 65: 8, 67: 5, 69: 1, 72: 6, 80: 3,
}
"""The reference's 'bad-ass' sudoku2 seed (Sudoku.scala:76-81) — needs
the DFS fallback, like it needs tryPossibilities there."""
