"""Round-2 fixes: 64-bit-exact CC labels, default-engine hub salting,
chunked CSR packing, wall-clock time limit, quadratic-path guards, and
the portable (Spark==DuckDB) hash that gives minhash/simhash/
fingerprint real oracles."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.algorithms import connected_components
from signal_collect_spark.algorithms.pagerank import pagerank
from signal_collect_spark.data import dedup as D
from signal_collect_spark.data import hashing as HS
from signal_collect_spark.data import textstats as TS
from signal_collect_spark.superstep import Kernel, run_supersteps


BIG = 2**60  # far above 2^53: a double-typed label would round these


@pytest.mark.parametrize("mode", ["sql", "csr"])
def test_cc_exact_with_64bit_ids(spark, mode):
    """r1 verdict #1 correctness landmine: labels must stay long —
    ids above 2^53 (e.g. xxhash64 node ids) are EXACT, not rounded."""
    pairs = [(BIG + 1, BIG + 2), (BIG + 2, BIG + 3), (BIG + 5, BIG + 6), (7, BIG + 1)]
    e = G.edges_from_pairs(spark, pairs)
    state, info = connected_components(spark, e, mode=mode, max_steps=20)
    got = {r["id"]: r["component"] for r in state.collect()}
    assert got == {
        7: 7,
        BIG + 1: 7,
        BIG + 2: 7,
        BIG + 3: 7,
        BIG + 5: BIG + 5,
        BIG + 6: BIG + 5,
    }
    assert dict(state.dtypes)["component"] == "bigint"
    info.release()


def test_value_dtype_long_rejects_weight_math(spark):
    k = Kernel(
        name="bad",
        init=lambda v: v.select("id", F.lit(1.0).alias("residual")),
        value=lambda: F.col("id"),
        edge_combine="mul",
        value_dtype="long",
    )
    e = G.edges_from_pairs(spark, [(1, 2)])
    with pytest.raises(ValueError, match="value_dtype='long'"):
        run_supersteps(spark, e, G.vertices_from_edges(e), k, max_steps=1)


def _star_graph(spark, fan=200, chain=100):
    pairs = [(0, i) for i in range(1, fan)] + [(i, i + 1) for i in range(1, chain)]
    return G.edges_from_pairs(spark, pairs)


def test_hub_salting_is_bit_identical(spark):
    """The sql-mode default engine splits hub fan-out across salt
    buckets (r1 verdict top item); results must equal the unsalted run
    exactly (sum aggregation is associative; same float order per dst
    is not guaranteed, so compare to 1e-12)."""
    e = _star_graph(spark)
    s1, i1 = pagerank(spark, e, max_steps=8, converge_tol=0.0, check_every=4,
                      hub_threshold=None)
    s2, i2 = pagerank(spark, e, max_steps=8, converge_tol=0.0, check_every=4,
                      hub_threshold=10)  # vertex 0 (deg 199) is a "hub"
    a = {r["id"]: r["rank"] for r in s1.collect()}
    b = {r["id"]: r["rank"] for r in s2.collect()}
    assert a.keys() == b.keys()
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12
    i1.release()
    i2.release()


def test_hub_salting_splits_edges_across_salts(spark):
    """The salted edge layout actually spreads a hub's adjacency over
    several salt values (not just a constant 0 column)."""
    e = _star_graph(spark)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    hubs = deg.filter(F.col("d") > 10).select(
        "src", F.least(F.ceil(F.col("d") / 10), F.lit(8)).cast("int").alias("__n_salt")
    )
    salted = e.join(F.broadcast(hubs), "src", "left").withColumn(
        "__salt",
        F.when(
            F.col("__n_salt").isNotNull(),
            F.pmod(F.xxhash64("dst"), F.col("__n_salt").cast("long")).cast("int"),
        ).otherwise(F.lit(0)),
    )
    n_salts_hub = salted.filter(F.col("src") == 0).select("__salt").distinct().count()
    assert n_salts_hub > 1  # hub rows spread over multiple buckets
    n_salts_rest = salted.filter(F.col("src") != 0).select("__salt").distinct().count()
    assert n_salts_rest == 1  # non-hubs untouched


def test_csr_chunked_pack_equals_monolithic(spark):
    """Bounded-size CSR chunk rows (Arrow 2 GiB guard) must not change
    results: run PageRank with a tiny chunk size so every partition
    splits into many chunks."""
    e = _star_graph(spark)
    s1, i1 = pagerank(spark, e, max_steps=6, converge_tol=0.0, check_every=3, mode="sql",
                      hub_threshold=None)
    a = {r["id"]: r["rank"] for r in s1.collect()}

    import signal_collect_spark.graph as gmod
    orig = gmod.csr_pack

    def tiny_chunks(edges, P, weight_col="weight", n_salts=1, max_chunk_edges=16):
        return orig(edges, P, weight_col=weight_col, n_salts=n_salts, max_chunk_edges=16)

    gmod.csr_pack = tiny_chunks
    try:
        import signal_collect_spark.superstep as ss
        ss.G.csr_pack = tiny_chunks
        s2, i2 = pagerank(spark, e, max_steps=6, converge_tol=0.0, check_every=3, mode="csr")
        b = {r["id"]: r["rank"] for r in s2.collect()}
    finally:
        gmod.csr_pack = orig
        ss.G.csr_pack = orig
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12
    i1.release()
    i2.release()


def test_csr_salts_over_partitions_rejected(spark):
    """csr_salts > P would alias salt replicas mod P and double-count
    (ADVICE r1)."""
    e = G.edges_from_pairs(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError, match="csr_salts"):
        pagerank(spark, e, max_steps=2, mode="csr", csr_salts=64, num_partitions=4)


def test_time_limit_stops_between_barriers(spark):
    """≙ ExecutionConfiguration timeLimit (ExecutionConfiguration.scala:
    86-97): with time_limit=0 the loop stops at the first convergence
    barrier and reports why."""
    e = _star_graph(spark)
    state, info = pagerank(
        spark, e, max_steps=50, converge_tol=0.0, check_every=1, time_limit=0.0
    )
    assert info.stop_reason == "time_limit"
    assert info.supersteps == 1  # stopped at the first barrier
    assert not info.converged
    info.release()


def test_checkpoint_overwrite_invalidates_done_marker(spark, tmp_path):
    """save() must drop the previous DONE marker before rewriting state
    (ADVICE r1: crash mid-overwrite must not leave a trusted-but-stale
    checkpoint)."""
    from signal_collect_spark.checkpoint import CheckpointManager

    ckpt = str(tmp_path / "ck")
    mgr = CheckpointManager(spark, ckpt)
    df = spark.range(10).select(F.col("id"), F.col("id").cast("double").alias("state"))
    mgr.save(df, superstep=3)
    assert mgr.latest_superstep() == 3
    done = os.path.join(ckpt, "superstep=000003", "DONE")
    assert os.path.exists(done)
    # re-save of the same superstep succeeds and re-creates the marker
    mgr.save(df, superstep=3)
    assert os.path.exists(done)
    assert mgr.restore()[1] == 3


# ---------------------------------------------------------------------------
# quadratic-path guards
# ---------------------------------------------------------------------------


def _boilerplate_docs(spark, n=40):
    """Every doc shares the same 3 stopword shingles + one unique tail."""
    rows = [(i, f"the quick brown fox unique{i} tail{i} end{i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_max_df_bounds_candidates(spark):
    docs = _boilerplate_docs(spark)
    unguarded = D.ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_df=None)
    assert unguarded.count() == 40 * 39 // 2  # fully quadratic
    guarded = D.ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_df=5)
    assert guarded.count() == 0  # stop-shingles dropped -> no candidates


def test_minhash_hot_bucket_cap(spark):
    """Identical docs collapse to one signature -> every band bucket
    holds all of them; the cap drops those buckets instead of emitting
    n^2/2 pairs in one task."""
    rows = [(i, "same same same same same") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = D.minhash_lsh_candidates(docs, num_hashes=16, bands=4, max_bucket=None)
    assert uncapped.count() == 30 * 29 // 2
    capped = D.minhash_lsh_candidates(docs, num_hashes=16, bands=4, max_bucket=10)
    assert capped.count() == 0


# ---------------------------------------------------------------------------
# portable hash: Spark == DuckDB bit-for-bit
# ---------------------------------------------------------------------------


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    words = ["hello", "the quick brown", "", "ünïcode §", "a b c d e f"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = df.select(
        HS.portable_hash60("s").alias("lo"), HS.portable_hash60_hi("s").alias("hi")
    ).collect()
    con = duckdb.connect()
    for row, w in zip(got, words):
        lo = con.sql(f"SELECT {HS.sql_hash60('?')}", params=[w]).fetchone()[0]
        hi = con.sql(f"SELECT {HS.sql_hash60_hi('?')}", params=[w]).fetchone()[0]
        assert (row["lo"], row["hi"]) == (lo, hi)


def test_fingerprint_portable_vs_xxhash_both_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id long, text string"
    )
    for fn in ("portable", "xxhash64"):
        fp = {r["id"]: r["fingerprint"] for r in TS.doc_fingerprint(docs, hash_fn=fn).collect()}
        assert fp[1] == fp[2]  # equal texts -> equal fingerprints
        assert fp[1] != fp[3]  # order-sensitive


def test_exact_dedup_sha_key_semantics(spark):
    docs = spark.createDataFrame(
        [(5, "x y"), (2, "x y"), (9, "z")], "doc_id long, text string"
    )
    got = {(r["canonical_id"], r["n_dups"]) for r in D.exact_duplicates(docs).collect()}
    assert got == {(2, 2), (9, 1)}


# ---------------------------------------------------------------------------
# path queries (≙ examples/PathQuery.scala) + console monitors
# ---------------------------------------------------------------------------


def _pq_brute(pairs, query):
    """Reference-faithful brute-force matcher (walk semantics, star =
    1..max consecutive matches)."""
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    verts = set(adj) | {d for ds in adj.values() for d in ds}
    out = set()

    def rec(vid, qi, srem, path):
        kind, arg = query[qi]
        if kind == "fixed" and vid != arg:
            return
        p2 = path + (vid,)
        nexts = []
        if qi + 1 < len(query):
            nq = query[qi + 1]
            nexts.append((qi + 1, (nq[1] - 1 if nq[0] == "star" else 0)))
        else:
            out.add(p2)
        if kind == "star" and srem > 0:
            nexts.append((qi, srem - 1))
        for nqi, nsrem in nexts:
            for nb in adj.get(vid, []):
                rec(nb, nqi, nsrem, p2)

    srem0 = query[0][1] - 1 if query[0][0] == "star" else 0
    for v in verts:
        rec(v, 0, srem0, ())
    return out


@pytest.mark.parametrize(
    "query",
    [
        [("star", 5), ("fixed", 2)],  # the reference demo's own query
        [("fixed", 0), ("wildcard", None), ("wildcard", None)],
        [("fixed", 0), ("star", 3), ("fixed", 5)],
        [("wildcard", None), ("fixed", 2), ("wildcard", None)],
    ],
)
def test_path_query_matches_bruteforce(spark, query):
    from signal_collect_spark.algorithms import fixed, path_query, star, wildcard

    # the reference demo graph (PathQuery.scala:169-186)
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 2), (2, 5)]
    e = G.edges_from_pairs(spark, pairs)
    nodes = [
        fixed(k[1]) if k[0] == "fixed" else (star(k[1]) if k[0] == "star" else wildcard())
        for k in query
    ]
    got = {tuple(r["path"]) for r in path_query(spark, e, nodes).collect()}
    assert got == _pq_brute(pairs, query)


def test_path_query_start_restriction_and_empty(spark):
    from signal_collect_spark.algorithms import path_query, wildcard

    pairs = [(0, 1), (1, 2)]
    e = G.edges_from_pairs(spark, pairs)
    got = {tuple(r["path"]) for r in path_query(spark, e, [wildcard(), wildcard()], start_ids=[0]).collect()}
    assert got == {(0, 1)}
    none = path_query(spark, e, [wildcard()], start_ids=[99])
    assert none.count() == 0


def test_break_condition_monitors(spark):
    """≙ the console's state-changes / GoesAbove / GoesBelow watches."""
    from signal_collect_spark import aggregations as AGG

    old = spark.createDataFrame([(1, 0.5), (2, 1.5), (3, 2.0)], "id long, state double")
    new = spark.createDataFrame([(1, 1.5), (2, 1.5), (3, 0.5)], "id long, state double")
    assert {r["id"] for r in AGG.state_changes(old, new).collect()} == {1, 3}
    assert {r["id"] for r in AGG.goes_above(old, new, 1.0).collect()} == {1}
    assert {r["id"] for r in AGG.goes_below(old, new, 1.0).collect()} == {3}


def test_graph_sample_json(spark):
    """≙ GraphAggregator's JSON subgraph payload."""
    import json

    from signal_collect_spark import aggregations as AGG

    state = spark.createDataFrame([(0, 0.1), (1, 0.2), (2, 0.3)], "id long, rank double")
    edges = G.edges_from_pairs(spark, [(0, 1), (1, 2), (2, 99)])
    rows = [json.loads(r["json"]) for r in AGG.graph_sample_json(state, edges, n=3).collect()]
    kinds = {r["kind"] for r in rows}
    assert kinds == {"vertex", "edge"}
    edge_rows = [r for r in rows if r["kind"] == "edge"]
    # (2, 99) excluded: 99 is outside the sampled vertex set
    assert {(r["src"], r["dst"]) for r in edge_rows} == {(0, 1), (1, 2)}


def test_multi_probe_lsh_recall_at_least_single_probe(spark):
    """Multi-probe (bucket XOR one plane bit) must find a superset-or-
    equal candidate set vs single probe, and stay a subset of brute
    force (r1 verdict: single-probe recall cliff)."""
    import numpy as np

    from signal_collect_spark.data import similarity as S

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 5)
    brute = {(r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(df, q, k=10).collect()}
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_bucketed_topk(df, q, k=10, n_planes=6, dim=16, n_probes=1).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_bucketed_topk(df, q, k=10, n_planes=6, dim=16, n_probes=4).collect()
    }
    assert len(multi & brute) >= len(single & brute)
    # multi-probe emits no duplicate pairs and respects k
    from collections import Counter

    rows = S.lsh_bucketed_topk(df, q, k=10, n_planes=6, dim=16, n_probes=4).collect()
    pairs = Counter((r["query_id"], r["neighbor_id"]) for r in rows)
    assert max(pairs.values()) == 1
    per_q = Counter(r["query_id"] for r in rows)
    assert max(per_q.values()) <= 10


def test_multi_aggregate_and_vertex_lookups(spark):
    from signal_collect_spark import aggregations as AGG

    state = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 5.0)], "id long, state double"
    )
    got = AGG.multi_aggregate(state, {"s": F.sum("state"), "n": F.count("*"), "mx": F.max("state")})
    assert got == {"s": 10.0, "n": 3, "mx": 5.0}
    assert AGG.for_vertex_with_id(state, 2) == {"id": 2, "state": 3.0}
    assert AGG.for_vertex_with_id(state, 99) is None


def test_recalculate_scores_rearms_residual(spark):
    """≙ Graph.recalculateScores: after zeroing residuals out-of-band,
    one empty-inbox collect pass recomputes them from current state."""
    from signal_collect_spark.algorithms.sssp import sssp_kernel
    from signal_collect_spark.superstep import recalculate_scores

    k = sssp_kernel(source_id=0)
    # a state patched out-of-band: distances set, residuals zeroed
    state = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, float("inf"), 0.0)], "id long, dist double, residual double"
    )
    re = recalculate_scores(state, k)
    got = {r["id"]: (r["dist"], r["residual"]) for r in re.collect()}
    # collect(min(dist, NULL)) keeps dist; residual recomputed from the
    # improvement rule (no improvement -> 0) — schema and values sane
    assert got[0][0] == 0.0 and got[1][0] == float("inf")
    assert set(re.columns) == {"id", "dist", "residual"}


def test_ivf_topk_recall_and_exactness_at_full_probe(spark):
    """IVF ANN: with nprobe == n_centroids the result equals brute
    force; with partial probes recall stays high on clustered data."""
    import numpy as np

    from signal_collect_spark.data import similarity as S

    rng = np.random.default_rng(11)
    # 4 well-separated clusters -> the coarse quantizer can find them
    centers = rng.standard_normal((4, 16)) * 4
    vecs = np.vstack([c + rng.standard_normal((50, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id").isin(0, 50, 100, 150))
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(df, q, k=5).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(df, q, k=5, n_centroids=4, nprobe=4, dim=16).collect()
    }
    assert full == brute  # nprobe == n_centroids is exact
    part = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(df, q, k=5, n_centroids=4, nprobe=1, dim=16).collect()
    }
    assert len(part & brute) / len(brute) >= 0.8  # clustered data: 1 probe ~ own cluster


def test_sessionize_native_matches_stateful_semantics(spark):
    """session_window (JVM) closed-session aggregates == the custom
    applyInPandasWithState operator's session definition, on batch."""
    import datetime as dt

    from signal_collect_spark import streaming as ST

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=60), 2.0),       # same session
        (1, base + dt.timedelta(seconds=4000), 4.0),     # new session (gap > 1800)
        (2, base, 10.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["n_events"], r["sum_value"], r["session_seconds"])
        for r in ST.sessionize_native(ev, gap_seconds=1800).collect()
    }
    assert got == {(1, 2, 3.0, 60.0), (1, 1, 4.0, 0.0), (2, 1, 10.0, 0.0)}


def test_dedup_pipeline_transitive_closure(spark):
    """A~B and B~C (but A,C share less) must still collapse into ONE
    class via the engine's connected components; uniques keep their id."""
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "alpha beta gamma delta epsilon zeta eta iota"),      # ~ 10
            (12, "beta gamma delta epsilon zeta eta iota kappa"),      # ~ 11
            (50, "totally different words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["canonical_id"]
        for r in D.dedup_pipeline(
            spark, docs, n=2, threshold=0.3, num_hashes=16, bands=8
        ).collect()
    }
    assert out[50] == 50
    assert out[10] == out[11] == out[12] == 10


def test_dedup_pipeline_no_duplicates_identity(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh"), (3, "ii jj kk ll")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["canonical_id"]
        for r in D.dedup_pipeline(spark, docs, n=2, threshold=0.9).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3}


def test_graph_builder_facade_roundtrip(spark, tmp_path):
    """≙ the reference's GraphBuilder.build -> addEdge -> execute ->
    aggregate -> snapshot -> shutdown call sequence (Graph.scala:60-230)."""
    from signal_collect_spark import aggregations as AGG
    from signal_collect_spark import build_graph

    g = build_graph(spark, num_partitions=4)
    g.add_edges([(0, 1), (1, 2), (2, 0)])
    ranks, info = g.execute("pagerank", converge_tol=1e-9)
    vals = {r["id"]: r["rank"] for r in ranks.collect()}
    assert all(abs(v - 1.0) < 0.01 for v in vals.values())  # cycle -> 1.0
    top = g.aggregate(AGG.top_k_states, 2, state_col="rank")
    assert top.count() == 2
    assert g.for_vertex_with_id(0)["rank"] == vals[0]
    ck = str(tmp_path / "gb_ck")
    g.snapshot(ck)
    g.last_state = None
    restored = g.restore(ck)
    assert {r["id"]: r["rank"] for r in restored.collect()} == vals
    g.remove_vertex(2)
    comp, _ = g.execute("connected_components", max_steps=10)
    assert comp.count() == 2  # vertices 0,1 remain
    g.shutdown()
    assert g._infos == []


def test_graph_builder_custom_kernel_and_errors(spark):
    from signal_collect_spark import build_graph
    from signal_collect_spark.algorithms.sssp import sssp_kernel

    g = build_graph(spark, num_partitions=4)
    with pytest.raises(ValueError, match="no state"):
        g.for_vertex_with_id(0)
    with pytest.raises(ValueError, match="unknown algorithm"):
        g.add_edge(0, 1).execute("nope")
    state, info = g.execute(sssp_kernel(0), max_steps=5)
    assert {r["id"]: r["dist"] for r in state.select("id", "dist").collect()} == {0: 0.0, 1: 1.0}
    g.shutdown()


def test_personalized_pagerank_seeds_only(spark):
    """Teleport mass restricted to a seed set: non-seed vertices get
    rank only through propagation; an unreachable non-seed gets 0."""
    e = G.edges_from_pairs(spark, [(1, 2), (2, 3), (9, 1)])
    pers = spark.createDataFrame([(1, 1.0)], "id long, p double")
    state, info = pagerank(spark, e, converge_tol=1e-12, max_steps=50, personalization=pers)
    got = {r["id"]: r["rank"] for r in state.collect()}
    assert abs(got[1] - 0.15) < 1e-9           # seed: no in-links from ranked mass
    assert abs(got[2] - 0.15 * 0.85) < 1e-9    # one hop
    assert got[9] == 0.0                        # non-seed, no in-links
    info.release()
