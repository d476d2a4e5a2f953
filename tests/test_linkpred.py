"""Link prediction (common neighbors / Adamic-Adar) vs a pure-Python
reference, plus the degree-cap and include_linked semantics."""

from __future__ import annotations

import math

from signal_collect_spark.algorithms.linkpred import adamic_adar, common_neighbors


def _python_aa(pairs, cap=None, include_linked=False):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out: dict[tuple[int, int], tuple[int, float]] = {}
    for v, ns in nbrs.items():
        if len(ns) < 2 or (cap is not None and len(ns) > cap):
            continue
        w_inv = 1.0 / math.log(len(ns))
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1 :]:
                cn, aa = out.get((u, w), (0, 0.0))
                out[(u, w)] = (cn + 1, aa + w_inv)
    if not include_linked:
        out = {p: s for p, s in out.items() if p not in und}
    return out


PAIRS = [
    (1, 2), (1, 3), (1, 4), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1),
    (7, 8), (8, 9), (7, 9), (9, 10), (2, 1), (3, 3),
]


def _collect(df):
    return {
        (r["u"], r["w"]): (r["cn"], r["aa"]) for r in df.collect()
    }


def test_adamic_adar_matches_python(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    got = _collect(adamic_adar(edges, max_center_degree=None))
    want = _python_aa(PAIRS)
    assert set(got) == set(want)
    for p, (cn, aa) in want.items():
        assert got[p][0] == cn
        assert math.isclose(got[p][1], aa, rel_tol=1e-12)


def test_center_degree_cap_excludes_hub_wedges(spark):
    # vertex 1 is the hub (degree 5 in PAIRS' undirected simple graph)
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    got = _collect(adamic_adar(edges, max_center_degree=3))
    want = _python_aa(PAIRS, cap=3)
    assert got.keys() == want.keys()
    for p, (cn, aa) in want.items():
        assert got[p][0] == cn
        assert math.isclose(got[p][1], aa, rel_tol=1e-12)


def test_include_linked_scores_existing_edges(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    got = _collect(adamic_adar(edges, max_center_degree=None, include_linked=True))
    want = _python_aa(PAIRS, include_linked=True)
    assert got.keys() == want.keys()
    # triangle edge (1,2) shares neighbor 3 -> must be present when linked
    assert (1, 2) in got


def test_common_neighbors_projection(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    rows = common_neighbors(edges, max_center_degree=None).collect()
    want = _python_aa(PAIRS)
    assert {(r["u"], r["w"]): r["cn"] for r in rows} == {
        p: cn for p, (cn, _) in want.items()
    }


def test_min_score_filters_output(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    full = _collect(adamic_adar(edges, max_center_degree=None))
    thresh = sorted(aa for _, aa in full.values())[len(full) // 2]
    got = _collect(adamic_adar(edges, max_center_degree=None, min_score=thresh))
    assert got.keys() == {p for p, (_, aa) in full.items() if aa >= thresh}


# ---------------------------------------------------------------------------
# directed wedges: co-citation / bibliographic coupling
# ---------------------------------------------------------------------------

def _python_wedges(pairs, center_idx, cap=None):
    e = {(a, b) for a, b in pairs if a != b}
    cen: dict[int, set[int]] = {}
    for a, b in e:
        c, n = (a, b) if center_idx == 0 else (b, a)
        cen.setdefault(c, set()).add(n)
    out: dict[tuple[int, int], int] = {}
    for ns in cen.values():
        if cap is not None and len(ns) > cap:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1 :]:
                out[(u, w)] = out.get((u, w), 0) + 1
    return out


DPAIRS = [
    (1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (3, 12), (3, 10),
    (4, 1), (5, 1), (4, 2), (5, 2), (1, 1),
]


def test_cocitation_matches_python(spark):
    from signal_collect_spark.algorithms.linkpred import cocitation

    edges = spark.createDataFrame(DPAIRS, "src long, dst long")
    got = {(r["u"], r["w"]): r["strength"] for r in cocitation(edges).collect()}
    assert got == _python_wedges(DPAIRS, 0)
    # 10 and 11 are both cited by 1 and 2 -> strength 2
    assert got[(10, 11)] == 2


def test_bib_coupling_matches_python(spark):
    from signal_collect_spark.algorithms.linkpred import bibliographic_coupling

    edges = spark.createDataFrame(DPAIRS, "src long, dst long")
    got = {
        (r["u"], r["w"]): r["strength"]
        for r in bibliographic_coupling(edges).collect()
    }
    assert got == _python_wedges(DPAIRS, 1)
    # 1 and 2 both cite 10 and 11 -> coupled with strength 2
    assert got[(1, 2)] == 2


def test_wedge_center_cap(spark):
    from signal_collect_spark.algorithms.linkpred import cocitation

    edges = spark.createDataFrame(DPAIRS, "src long, dst long")
    got = {
        (r["u"], r["w"]): r["strength"]
        for r in cocitation(edges, max_center_degree=2).collect()
    }
    assert got == _python_wedges(DPAIRS, 0, cap=2)
