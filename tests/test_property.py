"""Property-based (hypothesis) differential tests: the engine against
independent reference implementations on RANDOM inputs — the same
strategy the reference's integration specs use (assert vs analytically
known results), generalized beyond hand-picked fixtures.

Examples are kept small (Spark startup amortized via the session
fixture; each example costs ~1-2s), with deadline disabled — wall time
per example is Spark overhead, not algorithmic complexity.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from signal_collect_spark import graph as G

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic CI: same examples every run
)


def _edges_strategy(n_vertices=12, max_edges=40):
    edge = st.tuples(
        st.integers(0, n_vertices - 1), st.integers(0, n_vertices - 1)
    ).filter(lambda p: p[0] != p[1])
    return st.lists(edge, min_size=1, max_size=max_edges, unique=True)


def _numpy_pagerank(pairs, tol=1e-12):
    """Literal signal/collect PageRank (PageRankVertex.scala:37-40
    semantics: rank = 0.15 + 0.85 * Σ_in rank_src * w / Σ_out w,
    unnormalized, no dangling redistribution), iterated to fixpoint."""
    ids = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(ids)}
    outdeg = {v: 0 for v in ids}
    for s, _ in pairs:
        outdeg[s] += 1
    import numpy as np

    r = np.full(len(ids), 0.15)
    for _ in range(500):
        nxt = np.full(len(ids), 0.15)
        for s, d in pairs:
            nxt[idx[d]] += 0.85 * r[idx[s]] / outdeg[s]
        if abs(nxt - r).max() < tol:
            r = nxt
            break
        r = nxt
    return {v: r[idx[v]] for v in ids}


@given(pairs=_edges_strategy())
@settings(**_SETTINGS)
def test_pagerank_matches_numpy_fixpoint_on_random_graphs(spark, pairs):
    from signal_collect_spark.algorithms import pagerank

    e = G.edges_from_pairs(spark, pairs)
    state, info = pagerank(spark, e, converge_tol=1e-9, check_every=10,
                           num_partitions=4)
    got = {r["id"]: r["rank"] for r in state.collect()}
    want = _numpy_pagerank(pairs)
    assert got.keys() == want.keys()
    assert max(abs(got[k] - want[k]) for k in want) < 1e-6
    info.release()


def _union_find(pairs):
    parent = {}

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
    # full path compression, then min-id per set (the reference label)
    roots = {v: find(v) for v in parent}
    mins: dict[int, int] = {}
    for v, r in roots.items():
        mins[r] = min(mins.get(r, v), v)
    return {v: mins[r] for v, r in roots.items()}


@given(pairs=_edges_strategy(n_vertices=20, max_edges=30))
@settings(**_SETTINGS)
def test_cc_both_methods_match_union_find_on_random_graphs(spark, pairs):
    from signal_collect_spark.algorithms.components import connected_components

    e = G.edges_from_pairs(spark, pairs)
    want = _union_find(pairs)
    for method in ("minlabel", "star"):
        state, info = connected_components(spark, e, method=method, max_steps=60,
                                           num_partitions=4)
        got = {r["id"]: r["component"] for r in state.collect()}
        assert got == want, method
        info.release()


@given(
    # ≥3 words per text: a word-n-gram MinHash of an (n-1)-word text has
    # an empty shingle set and (correctly) never produces candidates
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=4), min_size=3, max_size=8
        ).map(" ".join),
        min_size=2,
        max_size=6,
    ),
    dup=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_minhash_lsh_invariants_on_random_corpora(spark, texts, dup):
    """Structural invariants on random corpora: (a) identical texts
    ALWAYS collide in every band (n_bands == bands); (b) candidate
    pairs are strictly ordered id_a < id_b; (c) band-match counts never
    exceed the number of bands."""
    from signal_collect_spark.data import dedup as D

    rows = [(i, t) for i, t in enumerate(texts)]
    clone_of = dup % len(texts)
    rows.append((100, texts[clone_of]))  # exact duplicate of one text
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bands = 4
    cands = D.minhash_lsh_candidates(docs, num_hashes=8, bands=bands, n=2).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["n_bands"] for r in cands}
    assert all(a < b for a, b in by_pair)
    assert all(1 <= nb <= bands for nb in by_pair.values())
    assert by_pair.get((clone_of, 100)) == bands  # exact dup collides everywhere


# ---------------------------------------------------------------------------
# URL canonicalization (data/web.py) — ground truth from the GENERATION
# side: parts are drawn first, the raw URL is decorated (case noise,
# default ports, trailing slash, fragment), and the expected canonical
# form is assembled directly from the parts — independent of the regex.
# ---------------------------------------------------------------------------

import random as _random

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=6
)
_url_parts = st.tuples(
    st.sampled_from(["http", "https", "ftp"]),          # scheme
    st.lists(_label, min_size=1, max_size=3),            # host labels
    st.sampled_from([None, "default", 8080, 21, 65535]), # port
    st.lists(
        st.text(
            alphabet="abcdefgABCDEFG0123456789.-_", min_size=1, max_size=6
        ),
        min_size=0,
        max_size=3,
    ),                                                    # path segments
    st.booleans(),                                        # trailing slash
    st.one_of(st.none(), st.text(alphabet="aBcD01=&", min_size=1, max_size=8)),
    st.one_of(st.none(), st.text(alphabet="xYz-2", min_size=0, max_size=5)),
    st.integers(0, 2**31),                                # casing seed
)

_DEFAULT_PORT = {"http": 80, "https": 443}


def _build_url(parts):
    scheme, labels, port, segs, trailing, query, fragment, seed = parts
    rng = _random.Random(seed)
    host = ".".join(labels)
    portnum = _DEFAULT_PORT.get(scheme) if port == "default" else port
    if port == "default" and portnum is None:
        portnum = None  # ftp has no default-port strip rule
    raw_hostport = "".join(
        c.upper() if rng.random() < 0.5 else c for c in host
    ) + (f":{portnum}" if portnum is not None else "")
    raw_scheme = "".join(c.upper() if rng.random() < 0.5 else c for c in scheme)
    path = "".join("/" + s for s in segs)
    raw_path = path + ("/" if trailing and segs else "")
    if not segs and trailing:
        raw_path = "/"
    raw = raw_scheme + "://" + raw_hostport + raw_path
    if query is not None:
        raw += "?" + query
    if fragment is not None:
        raw += "#" + fragment

    # expected canonical, assembled from parts (module docstring rules)
    keep_port = portnum is not None and portnum != _DEFAULT_PORT.get(scheme)
    canon_hostport = host + (f":{portnum}" if keep_port else "")
    canon_path = path if segs else "/"
    canon = scheme + "://" + canon_hostport + canon_path
    if query is not None:
        canon += "?" + query
    return raw, canon


@given(examples=st.lists(_url_parts, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_url_normalization_matches_parts_on_random_urls(spark, examples):
    from signal_collect_spark.data.web import normalize_url, url_host

    built = [_build_url(p) for p in examples]
    df = spark.createDataFrame([(raw,) for raw, _ in built], "url string")
    rows = df.select(
        "url",
        normalize_url("url").alias("norm"),
        url_host("url").alias("host"),
    ).collect()
    got = {r["url"]: (r["norm"], r["host"]) for r in rows}
    for (raw, canon), parts in zip(built, examples):
        assert got[raw][0] == canon, (raw, canon, got[raw][0])
        assert got[raw][1] == ".".join(parts[1]), raw


def _hk60(seed: str, v) -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}{v}".encode()).hexdigest()[:15], 16)


@given(pairs=_edges_strategy(n_vertices=10, max_edges=24))
@settings(**_SETTINGS)
def test_mis_equals_sequential_greedy_on_random_graphs(spark, pairs):
    """The parallel hash-priority rounds must converge to the UNIQUE
    sequential greedy MIS in (hash, id) order on every graph."""
    from signal_collect_spark.algorithms.mis import maximal_independent_set

    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = maximal_independent_set(spark, edges, rounds=12)
    rows = {r["id"]: r["status"] for r in out.collect()}

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    mis = set()
    for v in sorted(adj, key=lambda v: (_hk60("mis|", v), v)):
        if not (adj[v] & mis):
            mis.add(v)
    assert {v for v, s in rows.items() if s == "in"} == mis
    assert not any(s == "undecided" for s in rows.values())


@given(pairs=_edges_strategy(n_vertices=10, max_edges=24))
@settings(**_SETTINGS)
def test_matching_equals_sequential_greedy_on_random_graphs(spark, pairs):
    from signal_collect_spark.algorithms.matching import maximal_matching

    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = maximal_matching(spark, edges, rounds=12)
    got = {(r["lo"], r["hi"]) for r in out.collect() if r["matched"]}

    und = sorted(
        {(min(a, b), max(a, b)) for a, b in pairs},
        key=lambda e: (_hk60("mm|", f"{e[0]}|{e[1]}"), e),
    )
    used, want = set(), set()
    for lo, hi in und:
        if lo not in used and hi not in used:
            want.add((lo, hi))
            used.update((lo, hi))
    assert got == want
