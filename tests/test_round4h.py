"""Round-4 additions, batch h: maximal independent set, SemDeDup, and
the as-of join — each checked against an independent pure-Python /
pandas reference."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.mis import maximal_independent_set
from signal_collect_spark.data.clustering import semantic_dedup
from signal_collect_spark.data.temporal import asof_join


def _hk(seed: str, v) -> int:
    """Python replica of data/hashing.py portable_hash60."""
    return int(hashlib.md5(f"{seed}{v}".encode()).hexdigest()[:15], 16)


def _py_greedy_mis(pairs):
    """Sequential greedy MIS in (hash, id) priority order — the unique
    fixpoint the parallel rounds must converge to."""
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    mis = set()
    for v in sorted(adj, key=lambda v: (_hk("mis|", v), v)):
        if not (adj[v] & mis):
            mis.add(v)
    return mis, set(adj)


# ---------------------------------------------------------------------------
# maximal independent set
# ---------------------------------------------------------------------------


def _run_mis(spark, pairs, rounds=10):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, info = maximal_independent_set(spark, edges, rounds=rounds)
    return {r["id"]: (r["status"], r["round"]) for r in out.collect()}, info


def test_mis_matches_sequential_greedy(spark):
    # two triangles + a bridge + a pendant: mixed degrees
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (5, 6)]
    rows, info = _run_mis(spark, pairs)
    want, verts = _py_greedy_mis(pairs)
    assert {v for v, (s, _) in rows.items() if s == "in"} == want
    assert set(rows) == verts
    assert not any(s == "undecided" for s, _ in rows.values())
    assert info.stop_reason == "converged"


def test_mis_independent_and_maximal_on_grid(spark):
    # 6x6 grid graph
    def vid(r, c):
        return r * 6 + c

    pairs = []
    for r in range(6):
        for c in range(6):
            if c + 1 < 6:
                pairs.append((vid(r, c), vid(r, c + 1)))
            if r + 1 < 6:
                pairs.append((vid(r, c), vid(r + 1, c)))
    rows, _ = _run_mis(spark, pairs)
    ins = {v for v, (s, _) in rows.items() if s == "in"}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independent: no edge inside the set
    assert not any(adj[v] & ins for v in ins)
    # maximal: every out vertex has an in neighbor
    for v, (s, _) in rows.items():
        if s == "out":
            assert adj[v] & ins
    assert not any(s == "undecided" for s, _ in rows.values())
    # matches the sequential greedy fixpoint exactly
    want, _ = _py_greedy_mis(pairs)
    assert ins == want


def test_mis_fixed_rounds_leave_undecided_marked(spark):
    # a 5-path needs >=1 rounds; force rounds=1 and check the contract:
    # whatever is decided is consistent, the rest is marked undecided
    pairs = [(i, i + 1) for i in range(5)]
    rows, info = _run_mis(spark, pairs, rounds=1)
    assert info.supersteps == 1
    for v, (s, r) in rows.items():
        assert s in ("in", "out", "undecided")
        assert (r == 0) == (s == "undecided")
    ins = {v for v, (s, _) in rows.items() if s == "in"}
    assert ins  # round 1 always decides the global priority minimum
    assert not any(a in ins and b in ins for a, b in pairs)


def test_mis_releases_caches(spark):
    # loop state is localCheckpoint-ed (ContextCleaner-reclaimed), so
    # the CACHE MANAGER must end empty — the hamiltonian/crawler pattern
    spark.catalog.clearCache()
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out, _ = maximal_independent_set(spark, edges, rounds=4)
    out.count()
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty(), "mis left DataFrames cached"


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_drops_later_hash_duplicate(spark):
    # 1 and 2 are identical vectors (cos = 1); 3 is orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    out = {
        r["id"]: (r["cluster"], r["kept"])
        for r in semantic_dedup(_emb_df(spark, rows), k=1, iters=1, threshold=0.99).collect()
    }
    assert len(out) == 3 and out[3][1]  # the orthogonal vector survives
    survivor = min((1, 2), key=lambda v: (_hk("sd|", v), v))
    assert out[survivor][1] and not out[3 - survivor][1]


def test_semdedup_dedups_within_each_cluster_only(spark):
    # two well-separated directions, each with a near-identical pair:
    # k=2 puts each pair in its own cluster and drops its later member
    rows = [
        (1, [10.0, 0.0]),
        (3, [10.0, 0.1]),  # cos(1,3) ~= 0.99995
        (2, [0.0, 10.0]),
        (4, [0.1, 10.0]),  # cos(2,4) ~= 0.99995
    ]
    out = semantic_dedup(_emb_df(spark, rows), k=2, iters=2, threshold=0.999).collect()
    clusters = {r["id"]: r["cluster"] for r in out}
    kept = {r["id"]: r["kept"] for r in out}
    assert clusters[1] == clusters[3] != clusters[2] == clusters[4]
    for pair in ((1, 3), (2, 4)):
        survivor = min(pair, key=lambda v: (_hk("sd|", v), v))
        loser = pair[0] + pair[1] - survivor
        assert kept[survivor] and not kept[loser]


def test_semdedup_max_cluster_guard(spark):
    rows = [(i, [1.0, 0.0]) for i in range(6)]
    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dedup(_emb_df(spark, rows), k=1, iters=1, max_cluster=3)


def test_semdedup_threshold_one_epsilon_keeps_near_misses(spark):
    # cos just below threshold -> kept
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.5])]  # cos ~= 0.894
    out = {r["id"]: r["kept"] for r in semantic_dedup(_emb_df(spark, rows), k=1, iters=1, threshold=0.9).collect()}
    assert out[1] and out[2]


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10)), (2, 7, _ts(100)), (3, 8, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts(9), "a", 1.0), (7, _ts(50), "b", 2.0), (8, _ts(6), "c", 3.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_event_type"], r["asof_value"])
        for r in asof_join(left, right).collect()
    }
    assert got[1] == (_ts(9), "a", 1.0)
    assert got[2] == (_ts(50), "b", 2.0)
    assert got[3] == (None, None, None)  # right row is AFTER the left row


def test_asof_join_equal_ts_matches_and_tie_rule(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(10), "a", 1.0), (7, _ts(10), "b", 2.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    r = asof_join(left, right).first()
    # <= semantics: the equal-timestamp row matches; ties resolve to the
    # greatest (event_type, value) payload
    assert r["asof_ts"] == _ts(10) and r["asof_event_type"] == "b"


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(100)), (2, 7, _ts(11))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts(10), "a", 1.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    got = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join(left, right, tolerance_seconds=30).collect()
    }
    assert got[1] is None  # 90s stale > 30s tolerance
    assert got[2] == _ts(10)  # 1s fresh


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    lt = sorted(rng.randint(0, 1000, 60).tolist())
    rt = sorted(rng.randint(0, 1000, 40).tolist())
    lpd = pd.DataFrame(
        {"event_id": range(60), "user_id": [i % 3 for i in range(60)],
         "ts": [_ts(s) for s in lt]}
    )
    rpd = pd.DataFrame(
        {"user_id": [i % 3 for i in range(40)], "ts": [_ts(s) for s in rt],
         "event_type": [f"t{i}" for i in range(40)], "value": rng.rand(40).round(3)}
    )
    # pinned tie rule needs unique (user, ts) on the right for pandas
    rpd = rpd.sort_values(["user_id", "ts", "event_type", "value"]).drop_duplicates(
        ["user_id", "ts"], keep="last"
    )
    want = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="user_id", direction="backward", suffixes=("", "_r"),
    ).set_index("event_id")
    got = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    ).toPandas().set_index("event_id")
    for eid in want.index:
        w_ty = want.loc[eid, "event_type"]
        g_ty = got.loc[eid, "asof_event_type"]
        assert (pd.isna(w_ty) and g_ty is None) or w_ty == g_ty, eid


# ---------------------------------------------------------------------------
# maximal matching
# ---------------------------------------------------------------------------


def _py_greedy_matching(pairs):
    """Sequential greedy matching in (hash, lo, hi) priority order —
    the unique fixpoint the parallel rounds must converge to."""
    und = sorted(
        {(min(a, b), max(a, b)) for a, b in pairs if a != b},
        key=lambda e: (_hk("mm|", f"{e[0]}|{e[1]}"), e),
    )
    used, m = set(), set()
    for lo, hi in und:
        if lo not in used and hi not in used:
            m.add((lo, hi))
            used.update((lo, hi))
    return m, {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _run_matching(spark, pairs, rounds=10):
    from signal_collect_spark.algorithms.matching import maximal_matching

    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, info = maximal_matching(spark, edges, rounds=rounds)
    return out.collect(), info


def test_matching_matches_sequential_greedy(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (5, 6),
             (6, 7), (7, 8), (8, 6)]
    rows, info = _run_matching(spark, pairs)
    got = {(r["lo"], r["hi"]) for r in rows if r["matched"]}
    want, all_edges = _py_greedy_matching(pairs)
    assert got == want
    assert {(r["lo"], r["hi"]) for r in rows} == all_edges
    assert info.stop_reason == "converged"
    assert not any(r["round"] == 0 for r in rows)


def test_matching_is_vertex_disjoint_and_maximal(spark):
    # 5x4 grid
    def vid(r, c):
        return r * 4 + c

    pairs = []
    for r in range(5):
        for c in range(4):
            if c + 1 < 4:
                pairs.append((vid(r, c), vid(r, c + 1)))
            if r + 1 < 5:
                pairs.append((vid(r, c), vid(r + 1, c)))
    rows, _ = _run_matching(spark, pairs)
    matched = [(r["lo"], r["hi"]) for r in rows if r["matched"]]
    used = [v for e in matched for v in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    mv = set(used)
    for r in rows:  # maximal: every unmatched edge touches a matched vertex
        if not r["matched"]:
            assert r["lo"] in mv or r["hi"] in mv
    want, _ = _py_greedy_matching(pairs)
    assert set(matched) == want


def test_matching_releases_caches(spark):
    from signal_collect_spark.algorithms.matching import maximal_matching

    spark.catalog.clearCache()
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out, _ = maximal_matching(spark, edges, rounds=4)
    out.count()
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty()


# ---------------------------------------------------------------------------
# Katz centrality
# ---------------------------------------------------------------------------


def test_katz_matches_numpy_jacobi(spark):
    import numpy as np

    from signal_collect_spark.algorithms.katz import katz

    pairs = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (0, 2, 1.0), (3, 0, 1.0)]
    edges = spark.createDataFrame(pairs, "src long, dst long, weight double")
    alpha, beta, steps = 0.05, 1.0, 10
    out, info = katz(
        spark, edges, alpha=alpha, beta=beta, converge_tol=0.0, max_steps=steps
    )
    got = {r["id"]: r["katz"] for r in out.collect()}

    ids = sorted({v for a, b, _ in pairs for v in (a, b)})
    ix = {v: i for i, v in enumerate(ids)}
    W = np.zeros((len(ids), len(ids)))
    for a, b, w in pairs:
        W[ix[a], ix[b]] += w
    x = np.full(len(ids), beta)
    for _ in range(steps):
        x = beta + alpha * (W.T @ x)
    for v in ids:
        assert got[v] == pytest.approx(round(float(x[ix[v]]), 4), abs=1e-9)
    assert info.supersteps == steps


def test_katz_converges_and_diverge_guard(spark):
    from signal_collect_spark.algorithms.katz import katz

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double"
    )
    out, info = katz(spark, edges, alpha=0.2, converge_tol=1e-12, max_steps=200)
    got = {r["id"]: r["katz"] for r in out.collect()}
    # symmetric pair: x = 1 / (1 - alpha) exactly
    assert got[0] == pytest.approx(1.0 / 0.8, abs=1e-9)
    assert info.converged
    with pytest.raises(ValueError, match="lambda_max"):
        katz(spark, edges, alpha=1.5, converge_tol=1e-9)


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_python_aes(spark):
    from signal_collect_spark.data.sampling import weighted_sample

    rows = [(i, "s0" if i < 20 else "s1", float(1 + (i * 7) % 13)) for i in range(35)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got = {
        (r["source"], r["sample_rank"]): r["doc_id"]
        for r in weighted_sample(docs, "w", 5, strata_col="source").collect()
    }
    # independent python reference
    import math

    def key(i, w):
        h = _hk("wsamp|", i)
        u = (float(h) + 1.0) / float(1 << 60)
        return round(math.pow(u, 1.0 / w), 12)

    for src in ("s0", "s1"):
        members = [(i, w) for i, s, w in rows if s == src]
        order = sorted(members, key=lambda t: (-key(t[0], t[1]), _hk("wsamp|", t[0]), t[0]))
        for rank, (i, _w) in enumerate(order[:5], start=1):
            assert got[(src, rank)] == i, (src, rank)


def test_weighted_sample_zero_weight_excluded_and_heavy_bias(spark):
    from signal_collect_spark.data.sampling import weighted_sample

    rows = [(1, 0.0), (2, -1.0), (3, None), (4, 1e9), (5, 1e-9)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(docs, "w", 2)
    got = [r["doc_id"] for r in out.orderBy("sample_rank").collect()]
    assert set(got) == {4, 5} and got[0] == 4  # giant weight ranks first


# ---------------------------------------------------------------------------
# distributed Gram matrix
# ---------------------------------------------------------------------------


def test_embedding_gram_matches_numpy_and_tiers_agree(spark):
    import numpy as np

    from signal_collect_spark.data.linalg import embedding_gram

    rng = np.random.RandomState(3)
    X = rng.randn(40, 8).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    want = X.astype(np.float64).T @ X.astype(np.float64)
    for mode in ("expr", "numpy"):
        got = {
            (r["i"], r["j"]): r["g"]
            for r in embedding_gram(emb, dim=8, mode=mode).collect()
        }
        assert len(got) == 8 * 9 // 2
        for (i, j), g in got.items():
            assert i <= j
            assert g == pytest.approx(round(float(want[i, j]), 6), abs=2e-6), (mode, i, j)


def test_embedding_gram_unknown_mode(spark):
    from signal_collect_spark.data.linalg import embedding_gram

    emb = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="unknown mode"):
        embedding_gram(emb, dim=1, mode="gpu")


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_token_pmi_matches_python(spark):
    import math
    from collections import Counter

    from signal_collect_spark.data.textstats import token_pmi

    rows = [
        (1, "new york is a big city"),
        (2, "new york city hosts the new marathon"),
        (3, "a big apple in new york"),
        (4, "the marathon is big"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["a"], r["b"], r["pair_count"], r["pmi"])
        for r in token_pmi(docs, k=5, min_count=2).collect()
    ]

    toks = [t.split(" ") for _, t in rows]
    uni = Counter(tok for ts in toks for tok in ts)
    T = sum(uni.values())
    pairs = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    P = sum(pairs.values())
    scored = [
        (a, b, c, round(math.log2((c / P) / ((uni[a] / T) * (uni[b] / T))), 6))
        for (a, b), c in pairs.items()
        if c >= 2
    ]
    want = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:5]
    assert got == want
    assert ("new", "york") in {(a, b) for a, b, _, _ in got}  # the collocation


def test_token_pmi_single_token_docs_contribute_no_pairs(spark):
    from signal_collect_spark.data.textstats import token_pmi

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "alpha beta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    got = token_pmi(docs, k=10, min_count=2).collect()
    assert len(got) == 1 and (got[0]["a"], got[0]["b"]) == ("alpha", "beta")
