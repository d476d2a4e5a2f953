"""Bow-tie decomposition vs a pure-Python closure reference."""

from __future__ import annotations

from signal_collect_spark.algorithms.bowtie import bowtie


def _python_bowtie(pairs):
    verts = sorted({x for p in pairs for x in p if p[0] != p[1]})
    adj: dict[int, set[int]] = {v: set() for v in verts}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)

    def reach(starts, graph):
        seen = set(starts)
        stack = list(starts)
        while stack:
            x = stack.pop()
            for y in graph.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return seen

    fwd = {v: reach([v], adj) for v in verts}
    sccs: dict[int, set[int]] = {}
    for v in verts:
        members = frozenset(u for u in fwd[v] if v in fwd[u]) | {v}
        sccs[v] = set(members)
    groups = {}
    for v, mem in sccs.items():
        groups[min(mem | {v})] = mem | {v}
    core_lbl = sorted(groups, key=lambda l: (-len(groups[l]), l))[0]
    core = groups[core_lbl]
    radj: dict[int, set[int]] = {v: set() for v in verts}
    for a, b in pairs:
        if a != b:
            radj[b].add(a)
    can_reach_core = reach(core, radj)
    from_core = reach(core, adj)
    out = {}
    for v in verts:
        if v in core:
            out[v] = "CORE"
        elif v in can_reach_core:
            out[v] = "IN"
        elif v in from_core:
            out[v] = "OUT"
        else:
            out[v] = "OTHER"
    return out


# classic bow-tie: core {1,2,3} cycle; IN: 10->1, 11->10; OUT: 3->20->21;
# tendril off IN: 10->30 (reaches OUT? no - 30 terminal, OTHER);
# tube 11->40->20 (40 is IN? 40 reaches 20 (OUT), not core -> OTHER);
# disconnected island 50<->51 (2-cycle smaller than core)
PAIRS = [
    (1, 2), (2, 3), (3, 1),
    (10, 1), (11, 10),
    (3, 20), (20, 21),
    (10, 30),
    (11, 40), (40, 20),
    (50, 51), (51, 50),
]


def test_bowtie_matches_python(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    out, info = bowtie(spark, edges, num_partitions=2)
    got = {r["id"]: r["part"] for r in out.collect()}
    want = _python_bowtie(PAIRS)
    assert got == want
    # spot-check the intended structure
    assert want[1] == want[2] == want[3] == "CORE"
    assert want[10] == want[11] == "IN"
    assert want[20] == want[21] == "OUT"
    assert want[30] == want[40] == want[50] == "OTHER"


def test_core_tiebreak_smallest_label(spark):
    # two 2-cycles; {1,2} and {5,6} tie on size -> min label wins
    pairs = [(1, 2), (2, 1), (5, 6), (6, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = bowtie(spark, edges, num_partitions=2)
    got = {r["id"]: r["part"] for r in out.collect()}
    assert got == {1: "CORE", 2: "CORE", 5: "OTHER", 6: "OTHER"}


def test_dag_core_is_single_vertex(spark):
    pairs = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = bowtie(spark, edges, num_partitions=2)
    got = {r["id"]: r["part"] for r in out.collect()}
    want = _python_bowtie(pairs)
    assert got == want  # all SCCs singleton; core = vertex 1, 2/3 OUT


def test_no_cache_leak(spark):
    spark.catalog.clearCache()
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    out, _ = bowtie(spark, edges, num_partitions=2)
    out.count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "bowtie left DataFrames cached"
