"""Round-4 additions: graph structural profile and sliding event
windows — checked against pure-Python references."""

from __future__ import annotations

import datetime
import math

from signal_collect_spark import aggregations as AGG
from signal_collect_spark.streaming import sliding_event_counts


def test_graph_stats_matches_python(spark):
    pairs = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 1), (2, 3), (5, 1), (1, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    row = AGG.graph_stats(edges).first()

    dedup = {(a, b) for a, b in pairs if a != b}
    n_edges = len(dedup)
    verts = {v for e in dedup for v in e}
    recip = sum(1 for a, b in dedup if (b, a) in dedup)
    od: dict[int, int] = {}
    idg: dict[int, int] = {}
    for a, b in dedup:
        od[a] = od.get(a, 0) + 1
        idg[b] = idg.get(b, 0) + 1
    xs = [(od[a], idg[b]) for a, b in dedup]
    n = len(xs)
    sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs); syy = sum(y * y for _, y in xs)
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert row["n_edges"] == n_edges
    assert row["n_vertices"] == len(verts)
    assert row["n_reciprocal"] == recip == 2
    assert row["reciprocity"] == round(recip / n_edges, 6)
    assert row["assortativity"] == round(r, 6)


def test_sliding_event_counts_matches_python(spark):
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for i in range(50):
        ts = base + datetime.timedelta(seconds=i * 137 + (0.6 if i % 3 == 0 else 0.0))
        rows.append((ts, "a" if i % 2 == 0 else "b", float(i)))
    ev = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string, value double")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_event_counts(ev, "10 minutes", "5 minutes").collect()
    }
    exp: dict[tuple, list] = {}
    for ts, et, v in rows:
        t = int(ts.timestamp())  # floor: boundary math uses whole seconds
        for ws in ((t // 300) * 300 - 300, (t // 300) * 300):
            exp.setdefault((ws, et), [0, 0.0])
            exp[(ws, et)][0] += 1
            exp[(ws, et)][1] += v
    assert got == {k: (n, round(s, 6)) for k, (n, s) in exp.items()}
    # every event is in exactly 2 windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)


def test_graph_stats_zero_variance_yields_null(spark):
    # all in-degrees equal -> zero y-variance -> NULL, not an ANSI error
    edges = spark.createDataFrame([(1, 2), (2, 1), (1, 3)], "src long, dst long")
    row = AGG.graph_stats(edges).first()
    assert row["assortativity"] is None
    assert row["n_reciprocal"] == 2


def test_project_bipartite_matches_python(spark):
    from signal_collect_spark.graph import project_bipartite

    rows = [(g, i) for g in range(6) for i in range(g % 4 + 1)] + [(0, 0), (5, 9)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        tuple(r) for r in project_bipartite(edges, max_group=3).collect()
    )
    groups: dict[int, set] = {}
    for g, i in set(rows):
        groups.setdefault(g, set()).add(i)
    exp: dict[tuple, int] = {}
    for g, items in groups.items():
        if not (2 <= len(items) <= 3):
            continue
        s = sorted(items)
        for a in range(len(s)):
            for b in range(a + 1, len(s)):
                exp[(s[a], s[b])] = exp.get((s[a], s[b]), 0) + 1
    assert got == sorted((a, b, w) for (a, b), w in exp.items())


def test_project_bipartite_caps_hot_groups(spark):
    from signal_collect_spark.graph import project_bipartite

    rows = [(0, i) for i in range(100)] + [(1, 1), (1, 2)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = project_bipartite(edges, max_group=10).collect()
    # the 100-item group is dropped entirely; only the pair from group 1
    assert [(r["src"], r["dst"], r["weight"]) for r in out] == [(1, 2, 1)]
