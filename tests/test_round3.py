"""Round-3 fixes: num_partitions=1 hub-salting correctness, the
dedup_pipeline scale shape (single materialization of the candidate
stage, partition plumbing, convergence check), O(log n) star CC,
real multimodal codecs, hash-ordered IVF training sample, sessionize
boundary semantics, and checkpoint manifests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.algorithms.pagerank import pagerank


def _star_graph(spark, fan=40, chain=20):
    pairs = [(0, i) for i in range(1, fan)] + [(i, i + 1) for i in range(1, chain)]
    return G.edges_from_pairs(spark, pairs)


def test_hub_salting_correct_at_one_partition(spark):
    """ADVICE r2 (medium): with num_partitions=1 the P cap makes
    __n_salt == 1, and sequence(1, 0) evaluates DESCENDING to [1, 0] —
    the replica branch then unioned a duplicate salt-0 frontier row and
    double-counted every hub edge. A 1-salt hub must fall back to the
    unsalted path; results must match the hub_threshold=None run."""
    e = _star_graph(spark)
    s1, i1 = pagerank(spark, e, max_steps=6, converge_tol=0.0, check_every=3,
                      num_partitions=1, hub_threshold=None)
    s2, i2 = pagerank(spark, e, max_steps=6, converge_tol=0.0, check_every=3,
                      num_partitions=1, hub_threshold=10)  # vertex 0 deg 39 -> "hub"
    a = {r["id"]: r["rank"] for r in s1.collect()}
    b = {r["id"]: r["rank"] for r in s2.collect()}
    assert a.keys() == b.keys()
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12
    i1.release()
    i2.release()


# ---------------------------------------------------------------------------
# O(log n) connected components: large-star/small-star
# ---------------------------------------------------------------------------


def _random_pairs(seed, n_vertices=300, n_edges=350):
    import random

    rng = random.Random(seed)
    return list({
        tuple(sorted((rng.randrange(n_vertices), rng.randrange(n_vertices))))
        for _ in range(n_edges)
        if True
    })


@pytest.mark.parametrize("seed", [1, 2])
def test_star_cc_equals_minlabel_on_random_graphs(spark, seed):
    from signal_collect_spark.algorithms.components import connected_components

    pairs = [(a, b) for a, b in _random_pairs(seed) if a != b]
    e = G.edges_from_pairs(spark, pairs)
    ref, i1 = connected_components(spark, e, method="minlabel", max_steps=100)
    got, i2 = connected_components(spark, e, method="star", max_steps=50)
    assert i2.converged
    a = {r["id"]: r["component"] for r in ref.collect()}
    b = {r["id"]: r["component"] for r in got.collect()}
    assert a == b
    i1.release()
    i2.release()


def test_star_cc_64bit_ids_exact(spark):
    from signal_collect_spark.algorithms.components import connected_components

    BIG = 2**60
    pairs = [(BIG + 1, BIG + 2), (BIG + 2, BIG + 3), (BIG + 5, BIG + 6), (7, BIG + 1)]
    e = G.edges_from_pairs(spark, pairs)
    state, info = connected_components(spark, e, method="star")
    got = {r["id"]: r["component"] for r in state.collect()}
    assert got == {
        7: 7, BIG + 1: 7, BIG + 2: 7, BIG + 3: 7,
        BIG + 5: BIG + 5, BIG + 6: BIG + 5,
    }
    assert dict(state.dtypes)["component"] == "bigint"
    info.release()


def test_star_cc_path_graph_logarithmic_rounds(spark):
    """r2 verdict #5 'done' criterion: a 10^4-long path (diameter 10^4,
    the min-label worst case) must converge in ≲ 2·log₂(n) rounds."""
    import math

    from signal_collect_spark.algorithms.components import connected_components

    n = 10_000
    e = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"), F.lit(1.0).alias("weight")
    )
    comp, info = connected_components(spark, e, method="star", max_steps=40,
                                      num_partitions=8)
    assert info.converged
    assert info.supersteps <= 2 * math.ceil(math.log2(n)) + 2
    r = comp.agg(
        F.countDistinct("component").alias("k"),
        F.count("*").alias("n"),
        F.max("component").alias("mx"),
    ).first()
    assert (r["k"], r["n"], r["mx"]) == (1, n, 0)
    info.release()


def test_star_cc_directed_rejected(spark):
    from signal_collect_spark.algorithms.components import connected_components

    e = G.edges_from_pairs(spark, [(1, 2)])
    with pytest.raises(ValueError, match="undirected"):
        connected_components(spark, e, method="star", directed=True)


# ---------------------------------------------------------------------------
# dedup_pipeline scale shape (r2 verdict #1)
# ---------------------------------------------------------------------------


def _neardup_docs(spark):
    rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta iota"),
        (12, "beta gamma delta epsilon zeta eta iota kappa"),
        (50, "totally different words nothing shared here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_pipeline_persists_pairs_and_plumbs_partitions(spark, monkeypatch):
    """The candidate stage (LSH + per-pair Jaccard — the dominant cost)
    must reach the CC stage as a CACHED relation (it was evaluated ~3×
    in r2: isEmpty + engine degree scan + edge persist), and
    num_partitions / the O(log n) method must be plumbed through
    (was a hardcoded 8 / O(diameter) min-label)."""
    from signal_collect_spark.algorithms import components as C
    from signal_collect_spark.data import dedup as D

    captured = {}
    real = C.connected_components

    def spy(spark_, edges, **kw):
        captured["plan"] = edges._jdf.queryExecution().optimizedPlan().toString()
        captured["kw"] = kw
        return real(spark_, edges, **kw)

    monkeypatch.setattr(C, "connected_components", spy)
    out = {
        r["id"]: r["canonical_id"]
        for r in D.dedup_pipeline(
            spark, _neardup_docs(spark), n=2, threshold=0.3, num_hashes=16,
            bands=8, num_partitions=4,
        ).collect()
    }
    assert out == {10: 10, 11: 10, 12: 10, 50: 50}
    assert "InMemoryRelation" in captured["plan"]  # pairs served from cache
    assert captured["kw"]["num_partitions"] == 4
    assert captured["kw"]["method"] == "star"


def test_dedup_pipeline_raises_on_nonconvergence(spark):
    from signal_collect_spark.data import dedup as D

    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_pipeline(
            spark, _neardup_docs(spark), n=2, threshold=0.3, num_hashes=16,
            bands=8, max_steps=0,
        )
