"""Graph contraction (page→host rollup) vs a pure-Python reference,
including the package_graph convenience over the synthetic code table."""

from __future__ import annotations

from signal_collect_spark.graph import contract_graph


PAIRS = [
    (1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (4, 1, 3.0),
    (11, 2, 1.0), (11, 12, 5.0), (12, 11, 1.0), (3, 13, 2.0),
]
# groups of tens: 1-4 -> g0, 11-13 -> g1
GROUP = {v: v // 10 for v in {x for a, b, _ in PAIRS for x in (a, b)}}


def _python_contract(drop_self=True, weighted=True):
    out: dict[tuple[int, int], tuple[float, int]] = {}
    for a, b, w in PAIRS:
        ga, gb = GROUP[a], GROUP[b]
        if drop_self and ga == gb:
            continue
        wt, n = out.get((ga, gb), (0.0, 0))
        out[(ga, gb)] = (wt + (w if weighted else 1.0), n + 1)
    return out


def _dfs(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long, weight double")
    mapping = spark.createDataFrame(
        [(v, g) for v, g in GROUP.items()], "id long, group long"
    )
    return edges, mapping


def test_contract_weighted(spark):
    edges, mapping = _dfs(spark)
    got = {
        (r["gsrc"], r["gdst"]): (r["weight"], r["n_edges"])
        for r in contract_graph(edges, mapping, weight_col="weight").collect()
    }
    assert got == _python_contract()


def test_contract_unweighted_keeps_self_loops(spark):
    edges, mapping = _dfs(spark)
    got = {
        (r["gsrc"], r["gdst"]): (r["weight"], r["n_edges"])
        for r in contract_graph(edges, mapping, drop_self_loops=False).collect()
    }
    assert got == _python_contract(drop_self=False, weighted=False)


def test_contract_unmapped_vertices_drop(spark):
    edges, mapping = _dfs(spark)
    part = mapping.filter("id <> 13")  # edge (3,13) must vanish
    got = {
        (r["gsrc"], r["gdst"]) for r in contract_graph(edges, part).collect()
    }
    want = {
        (GROUP[a], GROUP[b])
        for a, b, _ in PAIRS
        if 13 not in (a, b) and GROUP[a] != GROUP[b]
    }
    assert got == want


def test_package_graph_rolls_up_code_links(spark):
    from signal_collect_spark import codegraph as CG
    from signal_collect_spark.fixtures import make_source_files

    src = make_source_files(spark, n_repos=2, files_per_repo=20)
    nodes, edges = CG.code_link_graph(src)
    pkg = CG.package_graph(nodes, edges)
    rows = pkg.collect()
    assert rows, "fixture graph has cross-package references"
    # groups are repo-qualified directories; no self-loops
    for r in rows:
        assert r["gsrc"] != r["gdst"]
        assert "::src/pkg_" in r["gsrc"]
    # total n_edges = file edges whose endpoints are in different packages
    nb = nodes.select("node_id", "repo", "path").collect()
    pkg_of = {
        r["node_id"]: r["repo"] + "::" + r["path"].rsplit("/", 1)[0] for r in nb
    }
    cross = sum(
        1
        for e in edges.collect()
        if pkg_of[e["src"]] != pkg_of[e["dst"]]
    )
    assert sum(r["n_edges"] for r in rows) == cross
