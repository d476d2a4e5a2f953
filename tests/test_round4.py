"""Round-4 additions: the int32/weight byte diet on the superstep edge
cache, persisted-cache leak fixes, the pre-collect LSH hot-bucket
guard, exact-ish star-CC convergence, sudoku validity gating, and the
"auto" partition sizing through the algorithm wrappers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.algorithms.components import connected_components
from signal_collect_spark.algorithms.pagerank import pagerank


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


# ---------------------------------------------------------------------------
# int32 / weight-column byte diet (SURVEY §7, r3 verdict #1)
# ---------------------------------------------------------------------------


def _pr_ranks(spark, edges, **opts):
    state, info = pagerank(
        spark, edges, signal_threshold=0.0, converge_tol=1e-12, max_steps=30, **opts
    )
    rows = {r["id"]: r["rank"] for r in state.collect()}
    info.release()
    return rows


def test_compact_ids_pagerank_equivalent(spark):
    edges = G.edges_from_pairs(
        spark, [(i, (i * 7 + 3) % 40) for i in range(40)] + [(3, 17), (17, 3), (0, 39)]
    )
    on = _pr_ranks(spark, edges, compact_ids=True)
    off = _pr_ranks(spark, edges, compact_ids=False)
    assert set(on) == set(off)
    for k in on:
        # different hash partitioning ⇒ different FP sum order; the diet
        # must stay within float tolerance of the undieted run
        assert on[k] == pytest.approx(off[k], abs=1e-9)


def test_compact_ids_cc_exact_and_int32_shuffle(spark):
    edges = G.edges_from_pairs(
        spark, [(i, i + 1) for i in range(0, 30, 2)] + [(100, 101), (101, 102)]
    )
    comp_on, i_on = connected_components(spark, edges, compact_ids=True)
    comp_off, i_off = connected_components(spark, edges, compact_ids=False)
    a = {(r["id"], r["component"]) for r in comp_on.collect()}
    b = {(r["id"], r["component"]) for r in comp_off.collect()}
    assert a == b  # integer-exact: the diet must not change a single label
    i_on.release()
    i_off.release()


def test_compact_ids_auto_falls_back_on_big_ids(spark):
    """Ids above 2^31 must disable the downcast, not corrupt labels."""
    big = 2**31 + 5
    edges = G.edges_from_pairs(spark, [(1, 2), (2, big), (big, big + 7)])
    comp, info = connected_components(spark, edges)  # compact_ids="auto"
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, big: 1, big + 7: 1}
    info.release()


def test_compact_ids_prunes_and_downcasts_edge_cache(spark, monkeypatch):
    """The persisted edge cache must hold exactly (src int, dst int) for
    a value-combine kernel under the diet — the measured bytes/edge
    lever. Asserted via the InMemoryRelation schema in the final plan;
    per-step lineage truncation (the r6 default) is disabled via the
    measurement hatch so the cache stays visible from the final state."""
    monkeypatch.setenv("SPARK_GRAFT_TRUNC", "1000000000")
    edges = G.edges_from_pairs(spark, [(1, 2), (2, 3), (3, 1)])
    comp, info = connected_components(spark, edges, compact_ids=True, hub_threshold=None)
    plan = comp._jdf.queryExecution().executedPlan().toString()
    headers = [
        ln.split("InMemoryRelation")[1].split("]")[0]
        for ln in plan.splitlines()
        if "InMemoryRelation" in ln and "src#" in ln
    ]
    assert headers, plan
    for hdr in headers:
        # e.g. " [src#34, dst#35" — ids int (no L suffix), no weight col
        assert "weight" not in hdr, hdr
        assert "L" not in hdr, "edge cache ids not int32: " + hdr
    info.release()


def test_pagerank_cache_drops_raw_weight(spark, monkeypatch):
    """PageRank's kernel reads norm_weight only; the raw weight column
    must not ride the per-superstep edge cache. Truncation disabled via
    the hatch so the cache is visible from the final state's plan."""
    monkeypatch.setenv("SPARK_GRAFT_TRUNC", "1000000000")
    edges = G.edges_from_pairs(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    state, info = pagerank(spark, edges, max_steps=3, converge_tol=0.0)
    plan = state._jdf.queryExecution().executedPlan().toString()
    headers = [
        ln.split("InMemoryRelation")[1].split("]")[0]
        for ln in plan.splitlines()
        if "InMemoryRelation" in ln and "src#" in ln
    ]
    assert headers, plan
    for hdr in headers:
        assert "norm_weight#" in hdr, hdr
        assert ", weight#" not in hdr, hdr
    info.release()


def test_wrapper_auto_partitions(spark):
    """num_partitions="auto" is the wrapper default now (r3 verdict #8):
    the engine sizes shuffles from the data with a defaultParallelism
    floor. Correctness through the wrapper is what is observable."""
    edges = G.edges_from_pairs(spark, [(i, (i + 1) % 25) for i in range(25)])
    state, info = pagerank(
        spark, edges, num_partitions="auto", converge_tol=1e-8, max_steps=150
    )
    ranks = {r["id"]: r["rank"] for r in state.collect()}
    info.release()
    # 25-cycle: every vertex converges to rank 1.0 (residual ~0.85^k)
    for v in ranks.values():
        assert v == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# persisted-cache leaks (r3 verdict "what's wrong" #1)
# ---------------------------------------------------------------------------


def test_hamiltonian_releases_caches(spark):
    from signal_collect_spark.algorithms.hamiltonian import hamiltonian_paths

    spark.catalog.clearCache()
    edges = G.edges_from_pairs(
        spark, [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)],
    )
    out = hamiltonian_paths(spark, edges)
    assert out.count() == 4
    assert _cache_manager(spark).isEmpty(), "hamiltonian left DataFrames cached"


def test_crawl_pagerank_releases_caches(spark):
    from signal_collect_spark.algorithms.crawler import crawl_pagerank

    spark.catalog.clearCache()
    pages = spark.createDataFrame(
        [
            ("a", '<a href="b">x</a><a href=\'c\'>y</a>'),
            ("b", '<a href="c">z</a>'),
            ("c", ""),
        ],
        "url string, html string",
    )
    out = crawl_pagerank(spark, pages, seeds=["a"], max_depth=2, max_steps=10)
    assert out.count() == 3
    assert _cache_manager(spark).isEmpty(), "crawl_pagerank left DataFrames cached"


def test_ngram_jaccard_releases_caches(spark):
    from signal_collect_spark.data.dedup import ngram_jaccard_pairs

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q u")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    assert out.count() == 1
    assert _cache_manager(spark).isEmpty(), "ngram_jaccard left DataFrames cached"


def test_superstep_engine_releases_edge_cache(spark):
    """The engine itself: after info.release() nothing stays cached."""
    spark.catalog.clearCache()
    edges = G.edges_from_pairs(spark, [(1, 2), (2, 3), (3, 1)])
    comp, info = connected_components(spark, edges)
    comp.collect()
    info.release()
    assert _cache_manager(spark).isEmpty()


# ---------------------------------------------------------------------------
# LSH hot-bucket guard ordering + max_bucket=None shape (r3 verdict #4)
# ---------------------------------------------------------------------------


def _degenerate_docs(spark, n=30):
    # n identical docs: every band hash collides → ONE bucket of size n
    return spark.createDataFrame(
        [(i, "the same exact words repeated here") for i in range(n)],
        "doc_id long, text string",
    )


def test_lsh_cap_drops_hot_bucket(spark):
    from signal_collect_spark.data.dedup import minhash_lsh_candidates

    docs = _degenerate_docs(spark)
    assert minhash_lsh_candidates(docs, num_hashes=8, bands=4, max_bucket=10).count() == 0


def test_lsh_guard_filters_before_collect(spark):
    """The bucket-size filter must sit UPSTREAM of the collect_list
    aggregate (ADVICE r3: downstream filtering still materialized the
    degenerate bucket's whole id array in one aggregation buffer)."""
    from signal_collect_spark.data.dedup import minhash_lsh_candidates

    out = minhash_lsh_candidates(
        _degenerate_docs(spark), num_hashes=8, bands=4, max_bucket=10
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    collect_at = min(i for i, ln in enumerate(lines) if "collect_list" in ln)
    guard_at = [i for i, ln in enumerate(lines) if "_w0" in ln or "__bsz" in ln]
    # lower line number = closer to the root; the guard must be BELOW
    # (larger index than) nothing — i.e. appear after collect_list's
    # aggregate in the top-down rendering means upstream of it
    assert guard_at and max(guard_at) > collect_at, plan


def test_lsh_none_uses_join_shape_and_matches(spark):
    from signal_collect_spark.data.dedup import minhash_lsh_candidates

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common text body shared tokens {i % 4}") for i in range(12)],
        "doc_id long, text string",
    )
    capped = minhash_lsh_candidates(docs, num_hashes=8, bands=4, max_bucket=10**6)
    none = minhash_lsh_candidates(docs, num_hashes=8, bands=4, max_bucket=None)
    assert {tuple(r) for r in capped.collect()} == {tuple(r) for r in none.collect()}
    # the None path must not build per-bucket id arrays at all
    plan = none._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan


# ---------------------------------------------------------------------------
# star CC: wider fingerprint, adversarial chain (r3 verdict #5)
# ---------------------------------------------------------------------------


def test_star_cc_chain_and_clusters_exact(spark):
    from signal_collect_spark.algorithms.components import connected_components_star

    pairs = [(i, i + 1) for i in range(200)]  # diameter-200 chain
    pairs += [(1000 + i, 1000 + (i * 3 + 1) % 40) for i in range(40)]
    pairs += [(2000, 2001)]
    edges = G.edges_from_pairs(spark, pairs)
    out, info = connected_components_star(spark, edges)
    got = {r["id"]: r["component"] for r in out.collect()}
    # union-find oracle
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert got == want
    assert info.converged
    # O(log n): a 200-diameter chain must not take ~200 rounds
    assert info.supersteps <= 20
    info.release()


# ---------------------------------------------------------------------------
# sudoku: contradictory complete givens must raise (ADVICE r3)
# ---------------------------------------------------------------------------


def test_sudoku_rejects_contradictory_complete_grid(spark):
    from signal_collect_spark.algorithms.sudoku import SUDOKU1, sudoku

    solved = {r["cell"]: r["value"] for r in sudoku(spark, SUDOKU1).collect()}
    bad = dict(solved)
    # introduce a duplicate in row 0 while keeping all 81 cells given:
    # propagation sees every cell determined and never hits a
    # contradiction branch — only the final validity gate can catch it
    bad[0] = bad[1]
    with pytest.raises(ValueError, match="violate"):
        sudoku(spark, bad)


def test_repetition_stats_id_column_named_id(spark):
    """ADVICE r3: id_col='id' used to make the short-doc anti-join
    ambiguous and raise."""
    from signal_collect_spark.data.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x")], "id long, text string"
    )
    rows = {r["id"]: r for r in repetition_stats(docs, n=2, id_col="id").collect()}
    assert rows[1]["n_grams"] == 5
    assert rows[2]["n_grams"] == 0


def test_decontaminate(spark):
    """Docs sharing >= min_hits distinct n-grams with the benchmark set
    are flagged; disjoint docs are not; every doc gets a row."""
    from signal_collect_spark.data.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # bench itself
            (2, "a quick brown fox appeared in the brown fox jumps story"),
            (3, "completely different words with no overlap at all"),
            (4, "xx"),  # too short for any 3-gram
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 1)
    got = {
        r["id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=3, min_hits=2).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1][1] is True  # the benchmark doc trivially matches itself
    # doc 2 shares "quick brown fox" and "brown fox jumps" → 2 hits
    assert got[2] == (2, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)


def test_crawler_regex_reference_consuming_semantics(spark):
    """The reference pattern consumes through the first </a>: nested
    anchors inside a consumed span are skipped and an unclosed anchor
    yields no link (ADVICE r3 conformance fix)."""
    from signal_collect_spark.algorithms.crawler import extract_links

    pages = spark.createDataFrame(
        [
            # second anchor opens before the first </a> → consumed, skipped
            ("p", '<a href="q">text <a href="r">inner</a> tail</a>'),
            # unclosed anchor → no match at all
            ("u", '<a href="v">never closed'),
        ],
        "url string, html string",
    )
    got = {(r["src"], r["dst"]) for r in extract_links(pages).collect()}
    assert got == {("p", "q")}
