"""Label spreading (clamped seeds) and bipartite butterfly counting
vs pure-Python references."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from signal_collect_spark.algorithms.butterflies import butterfly_count
from signal_collect_spark.algorithms.labelspread import label_spreading

WEDGES = [  # (a, b, weight)
    (1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (4, 2, 1.0), (5, 3, 3.0),
    (2, 5, 1.0), (6, 6, 1.0), (7, 3, 0.5),
]
SEEDS = {1: 1.0, 5: 0.0}


def _py_spread(pairs, seeds, steps, default=0.5):
    inn, inw = {}, {}
    verts = {v for a, b, _ in pairs for v in (a, b)}
    for a, b, w in pairs:
        inn.setdefault(b, []).append((a, w))
        inw[b] = inw.get(b, 0.0) + w
    p = {v: seeds.get(v, default) for v in verts}
    for _ in range(steps):
        nxt = {}
        for v in verts:
            if v in seeds or not inn.get(v):
                nxt[v] = p[v]
            else:
                nxt[v] = sum(p[u] * w for u, w in inn[v]) / inw[v]
        p = nxt
    return p


def test_label_spreading_matches_python(spark):
    edges = spark.createDataFrame(WEDGES, "src long, dst long, weight double")
    seeds = spark.createDataFrame(list(SEEDS.items()), "id long, label double")
    out, info = label_spreading(spark, edges, seeds, steps=6, num_partitions=4)
    got = {r["id"]: (r["p"], r["label"]) for r in out.collect()}
    want = _py_spread(WEDGES, SEEDS, 6)
    assert set(got) == set(want)
    for v, p in want.items():
        assert math.isclose(got[v][0], p, abs_tol=1e-9), v
        assert got[v][1] == (1 if p > 0.5 else 0)
    # seeds stay clamped exactly
    assert got[1][0] == 1.0 and got[5][0] == 0.0
    assert info.supersteps == 6


BIP = [  # (group, item)
    (10, 1), (10, 2), (10, 3),
    (20, 1), (20, 2),
    (30, 1), (30, 2), (30, 4),
    (40, 5),
    (10, 1),  # duplicate edge must not double-count
]


def _py_butterflies(pairs, max_group=1000):
    groups = {}
    for g, i in set(pairs):
        groups.setdefault(g, set()).add(i)
    skipped = sum(1 for items in groups.values() if len(items) > max_group)
    co = {}
    for items in groups.values():
        if len(items) > max_group:
            continue
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                co[(s[x], s[y])] = co.get((s[x], s[y]), 0) + 1
    n_pairs = len(co)
    n_wedges = sum(co.values())
    n_bf = sum(c * (c - 1) // 2 for c in co.values())
    return n_pairs, n_wedges, n_bf, skipped


def test_butterfly_count_matches_python(spark):
    edges = spark.createDataFrame(BIP, "src long, dst long")
    row = butterfly_count(edges).collect()[0]
    want = _py_butterflies(BIP)
    assert (
        row["n_pairs"], row["n_wedges"], row["n_butterflies"], row["n_groups_skipped"]
    ) == want
    # {1,2} shared by groups 10, 20, 30 -> C(3,2)=3 butterflies from
    # that pair alone; sanity-pin the known total
    assert row["n_butterflies"] == want[2] >= 3


def test_butterfly_max_group_skips_and_reports(spark):
    edges = spark.createDataFrame(BIP, "src long, dst long")
    row = butterfly_count(edges, max_group=2).collect()[0]
    want = _py_butterflies(BIP, max_group=2)
    assert (
        row["n_pairs"], row["n_wedges"], row["n_butterflies"], row["n_groups_skipped"]
    ) == want
    assert row["n_groups_skipped"] == 2  # groups 10 and 30 (3 items each)


def _py_rich_club(pairs, max_k=None):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ks = sorted({0} | set(deg.values()))
    out = {}
    for k in ks:
        nodes = [v for v, d in deg.items() if d > k]
        if len(nodes) < 2 or (max_k is not None and k > max_k):
            continue
        ns = set(nodes)
        ek = sum(1 for a, b in und if a in ns and b in ns)
        out[k] = (len(nodes), ek, round(2.0 * ek / (len(nodes) * (len(nodes) - 1)), 6))
    return out


def test_rich_club_matches_python(spark):
    from signal_collect_spark.algorithms.richclub import rich_club

    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4 elite
        (4, 5), (5, 6), (6, 7), (7, 8), (1, 9), (9, 10), (2, 1),
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in rich_club(edges).collect()
    }
    assert got == _py_rich_club(pairs)
    # the K4 core must show a denser club at high k than the whole graph
    ks = sorted(got)
    assert got[ks[-1]][2] > got[0][2]


def test_rich_club_max_k_truncates(spark):
    from signal_collect_spark.algorithms.richclub import rich_club

    pairs = [(1, 2), (1, 3), (1, 4), (2, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["k"] for r in rich_club(edges, max_k=1).collect()}
    assert got == {k for k in _py_rich_club(pairs, max_k=1)}
