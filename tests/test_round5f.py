"""Round-5 batch-4 registry additions: push PPR, crawl schedule,
import cycles, weighted PageRank — each vs an independent pure-Python
replica."""

from __future__ import annotations

import collections
import hashlib

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, triples):
    if len(triples[0]) == 2:
        triples = [(s, d, 1.0) for s, d in triples]
    return spark.createDataFrame(triples, "src long, dst long, weight double")


# ---------------------------------------------------------------- ppr_push


def _ppr_replica(edges, seeds, alpha, eps, rounds):
    """Synchronous ACL forward push, dict arithmetic (same FP ops)."""
    out = collections.defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    verts = sorted({v for e in edges for v in e} | set(seeds))
    p = {v: 0.0 for v in verts}
    r = {v: (1.0 if v in seeds else 0.0) for v in verts}
    for _ in range(rounds):
        act = {v for v in verts if r[v] > eps * max(len(out[v]), 1)}
        inc = collections.defaultdict(float)
        for u in act:
            for d in out[u]:
                inc[d] += (1.0 - alpha) * r[u] / len(out[u])
        for v in verts:
            p[v] = p[v] + (alpha * r[v] if v in act else 0.0)
            r[v] = (0.0 if v in act else r[v]) + inc.get(v, 0.0)
    return p, r


def test_ppr_push_matches_replica(spark):
    from signal_collect_spark.algorithms.ppr import ppr_push

    edges = [(i, (i * 3 + 1) % 17) for i in range(17)] + [
        (i, (i * 7 + 2) % 17) for i in range(0, 17, 2)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    seeds = {0, 5}
    out, info = ppr_push(
        spark,
        _edges_df(spark, edges),
        spark.createDataFrame([(s,) for s in seeds], "id long"),
        alpha=0.2,
        eps=1e-5,
        max_rounds=12,
        run_to_convergence=False,
        num_partitions=4,
    )
    got = {row["id"]: (row["ppr"], row["residual"]) for row in out.collect()}
    p, r = _ppr_replica(set(edges), seeds, 0.2, 1e-5, 12)
    assert set(got) == set(p)
    for v in p:
        assert got[v][0] == pytest.approx(p[v], abs=1e-12)
        assert got[v][1] == pytest.approx(r[v], abs=1e-12)


def test_ppr_push_mass_conservation_and_star(spark):
    from signal_collect_spark.algorithms.ppr import ppr_push

    # star: center 4 -> leaves 0..3; no dangling push loss until a leaf
    # (outdeg 0) activates and banks alpha*r, discarding the rest
    edges = [(4, i) for i in range(4)]
    out, info = ppr_push(
        spark,
        _edges_df(spark, edges),
        spark.createDataFrame([(4,)], "id long"),
        alpha=0.15,
        eps=1e-3,
        max_rounds=1,
        run_to_convergence=False,
        num_partitions=4,
    )
    got = {row["id"]: row for row in out.collect()}
    # one round: center pushes, p(4)=0.15, each leaf r = 0.85/4
    assert got[4]["ppr"] == pytest.approx(0.15)
    assert got[4]["residual"] == 0.0
    for i in range(4):
        assert got[i]["ppr"] == 0.0
        assert got[i]["residual"] == pytest.approx(0.85 / 4)
    total = sum(row["ppr"] + row["residual"] for row in got.values())
    assert total == pytest.approx(1.0, abs=1e-12)


def test_ppr_push_converges_and_validates(spark):
    from signal_collect_spark.algorithms.ppr import ppr_push

    with pytest.raises(ValueError):
        ppr_push(spark, _edges_df(spark, [(0, 1)]), None, alpha=1.5)
    with pytest.raises(ValueError):
        ppr_push(spark, _edges_df(spark, [(0, 1)]), None, eps=0.0)
    out, info = ppr_push(
        spark,
        _edges_df(spark, [(0, 1), (1, 0)]),
        spark.createDataFrame([(0,)], "id long"),
        eps=0.05,
        max_rounds=50,
        num_partitions=4,
    )
    assert info.converged and info.stop_reason == "converged"
    # residuals all below threshold (outdeg 1 each)
    for row in out.collect():
        assert row["residual"] <= 0.05


# ---------------------------------------------------------- crawl_schedule


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_crawl_schedule_matches_replica(spark):
    from signal_collect_spark.data.web import crawl_schedule

    rows = [
        (f"http://h{i % 3}.com/p{i}", f"h{i % 3}.com") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "url_norm string, host string")
    out = crawl_schedule(df, "url_norm", "host", width=2).collect()
    got = {r["url_norm"]: (r["fetch_round"], r["slot"]) for r in out}

    per_host = collections.defaultdict(list)
    for u, h in rows:
        per_host[h].append(u)
    want = {}
    for h, urls in per_host.items():
        urls.sort(key=lambda u: (_md5_60("crawl|" + u), u))
        for k, u in enumerate(urls):
            want[u] = (k // 2, k % 2)
    assert got == want
    # politeness: never more than width fetches per (host, round)
    per_round = collections.Counter(
        (r["host"], r["fetch_round"]) for r in out
    )
    assert max(per_round.values()) <= 2
    with pytest.raises(ValueError):
        crawl_schedule(df, width=0)


# ------------------------------------------------------- codegraph_cycles


def _tarjan_sccs(nodes, adj):
    """Iterative Tarjan — the textbook algorithm, nothing shared with
    the engine's FW-BW implementation."""
    index = {}
    low = {}
    on = set()
    stack = []
    sccs = []
    for root in nodes:
        if root in index:
            continue
        work = [(root, iter(adj.get(root, ())))]
        index[root] = low[root] = len(index)
        stack.append(root)
        on.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = len(index)
                    stack.append(w)
                    on.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
    return sccs


def test_codegraph_cycles_matches_tarjan(spark):
    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["repo"], r["path"], r["cycle_rep"], r["cycle_size"])
        for r in E._q_codegraph_cycles(spark, sf_dir).collect()
    }

    # replica: rebuild the arithmetic codegraph from doc ids, SCC via
    # Tarjan, keep components of size >= 2
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    idset = set(ids)
    repo = {i: f"org/repo-{i % 5}" for i in ids}
    path = {i: f"src/pkg_{i % 7}/mod_{i}.py" for i in ids}
    adj = collections.defaultdict(list)
    nodes = sorted(ids)
    for i in ids:
        refs = [(i * 7 + 3) % E.CG_MOD, (i * 13 + 5) % E.CG_MOD]
        if i % 10 == 0:
            refs.append((i * 31 + 11) % E.CG_MOD)
        for t in refs:
            if t in idset and t != i and repo[t] == repo[i]:
                adj[i].append(t)
    want = set()
    for comp in _tarjan_sccs(nodes, adj):
        if len(comp) < 2:
            continue
        rep = min(path[v] for v in comp)
        for v in comp:
            want.add((repo[v], path[v], rep, len(comp)))
    assert got == want
    assert want, "fixture graph must actually contain import cycles"


# ------------------------------------------------------ weighted pagerank


def test_weighted_pagerank_matches_replica(spark):
    from signal_collect_spark.algorithms import pagerank

    triples = []
    for i in range(12):
        triples.append((i, (i * 5 + 2) % 12, float((i % 3) + 1)))
        triples.append((i, (i * 7 + 3) % 12, float((i % 4) + 2)))
    triples = [(s, d, w) for s, d, w in triples if s != d]
    state, _ = pagerank(
        spark,
        _edges_df(spark, triples),
        signal_threshold=0.0,
        converge_tol=0.0,
        max_steps=8,
        check_every=4,
        num_partitions=4,
    )
    got = {r["id"]: r["rank"] for r in state.collect()}

    wsum = collections.defaultdict(float)
    for s, d, w in triples:
        wsum[s] += w
    verts = sorted({v for s, d, _ in triples for v in (s, d)})
    rank = {v: 0.15 for v in verts}
    for _ in range(8):
        acc = collections.defaultdict(float)
        for s, d, w in triples:
            acc[d] += rank[s] * (w / wsum[s])
        rank = {v: 0.15 + 0.85 * acc.get(v, 0.0) for v in verts}
    for v in verts:
        assert got[v] == pytest.approx(rank[v], abs=1e-9)


# ----------------------------------------------------------- interval_join


def test_interval_join_boundaries_and_multibucket(spark):
    from signal_collect_spark.data.temporal import interval_join

    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 199), (4, 200), (5, 99), (6, 1000)],
        "pid long, ts long",
    )
    ivs = spark.createDataFrame(
        [(100, 200, "a"), (150, 1001, "b")],  # b spans many buckets
        "start long, end long, tag string",
    )
    out = interval_join(
        points, ivs, point_ts="ts", bucket_width=30
    ).select("pid", "tag").collect()
    got = {(r["pid"], r["tag"]) for r in out}
    # half-open: ts==start in, ts==end out
    want = {(1, "a"), (2, "a"), (3, "a"), (2, "b"), (3, "b"), (4, "b"), (6, "b")}
    assert got == want


def test_interval_join_guard_and_validation(spark):
    import pytest as _pytest

    from signal_collect_spark.data.temporal import interval_join

    points = spark.createDataFrame([(1, 5)], "pid long, ts long")
    ivs = spark.createDataFrame([(0, 10_000)], "start long, end long")
    with _pytest.raises(ValueError, match="max_buckets_per_interval"):
        interval_join(
            points, ivs, point_ts="ts", bucket_width=10,
            max_buckets_per_interval=100,
        )
    with _pytest.raises(ValueError, match="bucket_width"):
        interval_join(points, ivs, point_ts="ts", bucket_width=0)


def test_interval_join_matches_bruteforce_random(spark):
    import random

    from signal_collect_spark.data.temporal import interval_join

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 5000)) for i in range(300)]
    ivs = []
    for j in range(40):
        s = rng.randrange(0, 4800)
        ivs.append((j, s, s + rng.randrange(1, 400)))
    out = interval_join(
        spark.createDataFrame(pts, "pid long, ts long"),
        spark.createDataFrame(ivs, "iid long, start long, end long"),
        point_ts="ts",
        bucket_width=128,
    ).select("pid", "iid").collect()
    got = {(r["pid"], r["iid"]) for r in out}
    want = {
        (p, i) for p, t in pts for i, s, e in ivs if s <= t < e
    }
    assert got == want


# -------------------------------------------------------- bond_percolation


def _union_find_sizes(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    sizes = collections.Counter(find(v) for v in parent)
    return collections.Counter(sizes.values())


def test_bond_percolation_matches_union_find(spark):
    import duckdb

    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["component_size"], r["n_components"])
        for r in E._q_bond_percolation(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    rows = con.execute(
        """SELECT DISTINCT l_orderkey % 5000 AS src, l_partkey % 5000 AS dst
           FROM lineitem
           WHERE l_linenumber = 1 AND l_orderkey % 5000 <> l_partkey % 5000"""
    ).fetchall()
    kept = [
        (s, d)
        for s, d in rows
        if _md5_60(f"perc|{s}|{d}") % 100 < E.PERC_KEEP
    ]
    hist = _union_find_sizes(kept)
    assert got == set(hist.items())
    # the coin must actually drop edges, not pass everything through
    assert 0 < len(kept) < len(rows)


# ---------------------------------------------------------- graph_coarsen


def test_graph_coarsen_contraction_is_consistent(spark):
    """Contract the sparse graph onto its verified matching and check
    the composition against a collected-edge replica: same group map,
    same summed weights, supervertex count == |V| - |matched pairs|."""
    from signal_collect_spark.algorithms.matching import maximal_matching
    from signal_collect_spark.graph import contract_graph, vertices_from_edges

    triples = []
    for i in range(30):
        triples.append((i, (i * 11 + 3) % 30, float(i % 4 + 1)))
        triples.append((i, (i * 17 + 7) % 30, float(i % 3 + 1)))
    triples = [(s, d, w) for s, d, w in triples if s != d]
    edges = _edges_df(spark, triples)

    m, _ = maximal_matching(spark, edges, rounds=12, num_partitions=4)
    matched = [(r["lo"], r["hi"]) for r in m.collect() if r["matched"]]
    grp = {}
    for lo, hi in matched:
        grp[lo] = lo
        grp[hi] = lo
    verts = {v for s, d, _ in triples for v in (s, d)}
    for v in verts:
        grp.setdefault(v, v)

    mapping = spark.createDataFrame(
        [(v, g) for v, g in grp.items()], "id long, group long"
    )
    out = contract_graph(edges, mapping, weight_col="weight")
    got = {
        (r["gsrc"], r["gdst"]): (r["weight"], r["n_edges"])
        for r in out.collect()
    }

    want = collections.defaultdict(lambda: [0.0, 0])
    for s, d, w in triples:
        gs, gd = grp[s], grp[d]
        if gs == gd:
            continue
        want[(gs, gd)][0] += w
        want[(gs, gd)][1] += 1
    assert got == {k: (w, n) for k, (w, n) in want.items()}
    assert len(set(grp.values())) == len(verts) - len(matched)
    assert matched, "fixture graph must produce a non-empty matching"


# -------------------------------------------------------------- zipf_fit


def test_zipf_fit_exact_minus_one_slope(spark):
    from signal_collect_spark.data.textstats import zipf_fit

    # freq(r) = 120 / r for r = 1..6 -> ln f = ln 120 - 1 * ln r:
    # the regression must recover slope -1, intercept ln 120 exactly
    freqs = [120, 60, 40, 30, 24, 20]
    text = " ".join(
        " ".join(f"tok{chr(97 + i)}" for _ in range(f))
        for i, f in enumerate(freqs)
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = zipf_fit(docs, top_ranks=6).first()
    import math

    assert row["n_ranks"] == 6
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=1e-6)
    assert row["zipf_intercept"] == pytest.approx(math.log(120), abs=1e-6)


def test_zipf_fit_matches_replica_and_validates(spark):
    import math

    from signal_collect_spark.data.textstats import zipf_fit

    docs_rows = [
        (i, " ".join(f"w{(i * j) % 13}" for j in range(40))) for i in range(25)
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    row = zipf_fit(docs, top_ranks=10).first()

    cnt = collections.Counter(
        t for _, text in docs_rows for t in text.split(" ") if t
    )
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    xs = [math.log(r + 1) for r in range(len(top))]
    ys = [math.log(f) for _, f in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["n_ranks"] == n
    assert row["zipf_slope"] == pytest.approx(round(slope, 6), abs=2e-6)
    assert row["zipf_intercept"] == pytest.approx(
        round((sy - slope * sx) / n, 6), abs=2e-6
    )
    with pytest.raises(ValueError):
        zipf_fit(docs, top_ranks=1)
