"""Round-4 additive operators: k-core / core-number peeling, HITS, and
the training-data ops added alongside (paragraph dedup, PII redaction,
stratified sampling) — each checked against an independent pure-Python
or numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.algorithms.hits import hits
from signal_collect_spark.algorithms.kcore import core_number, k_core


# ---------------------------------------------------------------------------
# independent references
# ---------------------------------------------------------------------------


def _py_k_core(pairs: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Sequential peeling: returns {id: within-core degree}."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def _py_core_number(pairs: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core: dict[int, int] = {}
    k = 1
    while adj:
        # peel everything below k; dropped vertices have core k-1
        while True:
            low = [v for v, ns in adj.items() if len(ns) < k]
            if not low:
                break
            for v in low:
                for u in adj[v]:
                    adj[u].discard(v)
                core[v] = k - 1
                del adj[v]
        k += 1
    return core


def _np_hits(pairs: list[tuple[int, int]], steps: int) -> dict[int, tuple[float, float]]:
    ids = sorted({x for p in pairs for x in p})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for s, d in set(pairs):
        A[ix[s], ix[d]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(steps):
        a = A.T @ h
        na = np.linalg.norm(a)
        a = a / na if na > 0 else a
        h = A @ a
        nh = np.linalg.norm(h)
        h = h / nh if nh > 0 else h
    return {v: (h[ix[v]], a[ix[v]]) for v in ids}


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------

PAIRS = (
    # a 4-clique (3-core), a triangle hanging off it, and a tail chain
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    + [(3, 4), (4, 5), (5, 3)]
    + [(5, 6), (6, 7), (7, 8)]
)


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_k_core_matches_sequential_peeling(spark, k):
    edges = G.edges_from_pairs(spark, PAIRS)
    out, info = k_core(spark, edges, k, num_partitions=4)
    got = {r["id"]: r["core_degree"] for r in out.collect()}
    assert got == _py_k_core(PAIRS, k)
    assert info.converged


def test_k_core_random_graph(spark):
    rng = np.random.default_rng(7)
    pairs = [tuple(map(int, rng.integers(0, 60, 2))) for _ in range(300)]
    edges = G.edges_from_pairs(spark, pairs)
    for k in (2, 4):
        out, _ = k_core(spark, edges, k, num_partitions=4)
        got = {r["id"]: r["core_degree"] for r in out.collect()}
        assert got == _py_k_core(pairs, k)


def test_core_number_matches_sequential(spark):
    edges = G.edges_from_pairs(spark, PAIRS)
    out, info = core_number(spark, edges, num_partitions=4)
    got = {r["id"]: r["core"] for r in out.collect()}
    assert got == _py_core_number(PAIRS)
    assert info.converged


def test_k_core_empty_when_k_too_large(spark):
    edges = G.edges_from_pairs(spark, [(0, 1), (1, 2)])
    out, _ = k_core(spark, edges, 5, num_partitions=2)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def test_hits_matches_numpy_power_iteration(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2), (4, 3), (1, 4)]
    edges = G.edges_from_pairs(spark, pairs)
    out, info = hits(spark, edges, steps=12, num_partitions=4)
    ref = _np_hits(pairs, 12)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    assert set(got) == set(ref)
    for v, (h, a) in ref.items():
        assert got[v][0] == pytest.approx(h, abs=1e-9)
        assert got[v][1] == pytest.approx(a, abs=1e-9)
    assert info.supersteps == 12


def test_hits_sink_and_source_vertices(spark):
    # 9 is a pure sink (authority only), 0 a pure source (hub only)
    pairs = [(0, 9), (0, 1), (1, 9)]
    edges = G.edges_from_pairs(spark, pairs)
    out, _ = hits(spark, edges, steps=8, num_partitions=2)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    ref = _np_hits(pairs, 8)
    for v in ref:
        assert got[v][0] == pytest.approx(ref[v][0], abs=1e-9)
        assert got[v][1] == pytest.approx(ref[v][1], abs=1e-9)
    assert got[9][0] == 0.0
    assert got[0][1] == 0.0


def test_kcore_hits_release_caches(spark):
    spark.catalog.clearCache()
    edges = G.edges_from_pairs(spark, PAIRS)
    out1, _ = k_core(spark, edges, 2, num_partitions=2)
    out1.count()
    out2, _ = hits(spark, edges, steps=3, num_partitions=2)
    out2.count()
    out3, _ = core_number(spark, edges, num_partitions=2)
    out3.count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ---------------------------------------------------------------------------
# paragraph dedup / PII redaction / stratified sampling
# ---------------------------------------------------------------------------

import hashlib
import re


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_paragraph_dedup_matches_python(spark):
    from signal_collect_spark.data.dedup import paragraph_dedup

    corpus = [
        (1, "alpha beta\ncommon line\ngamma"),
        (2, "common line\ndelta\nalpha beta"),
        (3, "common line"),
        (4, "unique one\nunique two"),
        (5, "alpha beta\nalpha beta"),  # self-duplicate paragraphs
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = {
        r["id"]: (r["text_dedup"], r["n_paragraphs"], r["n_removed"])
        for r in paragraph_dedup(docs).collect()
    }
    # python reference: first (doc_id, pos) wins globally
    seen = set()
    ref = {}
    for did, text in sorted(corpus):
        paras = text.split("\n")
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        ref[did] = ("\n".join(kept), len(paras), len(paras) - len(kept))
    assert out == ref
    # doc 3 was fully duplicated away
    assert out[3][0] == ""


def test_pii_redact_matches_python_re(spark):
    from signal_collect_spark.data.textstats import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_redact,
    )

    rows = [
        (1, "write to a.b+c@ex-ample.org or root@sub.domain.co today"),
        (2, "server 10.0.255.1 and 192.168.1.77 up; port 8080"),
        (3, "call 555-123-4567 or 555 987 6543 x2"),
        (4, "no pii here at all"),
        (5, "mix: x@y.io at 1.2.3.4 phone 111.222.3333"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r.asDict() for r in pii_redact(docs).collect()}
    for did, text in rows:
        red = re.sub(PII_EMAIL_RE, "<EMAIL>", text)
        red = re.sub(PII_IPV4_RE, "<IP>", red)
        red = re.sub(PII_PHONE_RE, "<PHONE>", red)
        assert got[did]["text_redacted"] == red, did
        assert got[did]["n_emails"] == len(re.findall(PII_EMAIL_RE, text))
        assert got[did]["n_ipv4"] == len(re.findall(PII_IPV4_RE, text))
        assert got[did]["n_phones"] == len(re.findall(PII_PHONE_RE, text))
    assert got[5]["text_redacted"] == "mix: <EMAIL> at <IP> phone <PHONE>"


def test_stratified_sample_matches_python(spark):
    from signal_collect_spark.data.sampling import stratified_sample

    rows = [(i, "ab"[i % 2] * 1, f"t{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = stratified_sample(docs, "lang", 5).collect()
    # python reference
    by_stratum: dict[str, list] = {}
    for i, lg, _ in rows:
        by_stratum.setdefault(lg, []).append((_h60(f"strat|{i}"), i))
    expect = set()
    for lg, lst in by_stratum.items():
        for rank, (_, i) in enumerate(sorted(lst)[:5], start=1):
            expect.add((i, lg, rank))
    assert {(r["doc_id"], r["lang"], r["sample_rank"]) for r in out} == expect
    # every stratum capped
    assert all(r["sample_rank"] <= 5 for r in out)


def test_stratified_sample_seed_changes_sample(spark):
    from signal_collect_spark.data.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "x", f"t{i}") for i in range(50)], ["doc_id", "lang", "text"]
    )
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", 10).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", 10, seed="other|").collect()
    }
    assert a != b  # independent draws (50 choose 10 collision ~ impossible)


def test_hash_fraction_sample_deterministic(spark):
    from signal_collect_spark.data.sampling import hash_fraction_sample

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], ["doc_id", "text"]
    )
    s1 = {r["doc_id"] for r in hash_fraction_sample(docs, 0.25).collect()}
    s2 = {
        r["doc_id"]
        for r in hash_fraction_sample(docs.repartition(7), 0.25).collect()
    }
    assert s1 == s2  # partitioning-independent
    assert s1 == {i for i in range(2000) if _h60(f"frac|{i}") < int(0.25 * 2**60)}
    assert 0.2 < len(s1) / 2000 < 0.3


def test_pack_sequences_matches_python(spark):
    from signal_collect_spark.data.packing import pack_sequences

    rows = [(i, max(0, (i * 37) % 100 - (5 if i == 7 else 0)), f"d{i}") for i in range(30)]
    rows[3] = (3, 0, "empty")  # zero-token doc
    rows[9] = (9, 260, "giant")  # spans multiple seqs at seq_len=64
    docs = spark.createDataFrame(rows, ["doc_id", "n_tokens", "text"])
    out = {r["id"]: r.asDict() for r in pack_sequences(docs, 64).collect()}

    ordered = sorted(rows, key=lambda r: (_h60(f"pack|{r[0]}"), r[0]))
    off = 0
    for did, n, _ in ordered:
        start = off
        off += n
        assert out[did]["start_offset"] == start, did
        assert out[did]["seq_first"] == start // 64
        last = (start + max(n - 1, 0)) // 64
        assert out[did]["seq_last"] == last
        expect_nseqs = 0 if n == 0 else last - start // 64 + 1
        assert out[did]["n_seqs"] == expect_nseqs
    assert out[9]["n_seqs"] >= 4  # the giant doc straddles


def test_pack_sequences_id_order_and_total(spark):
    from signal_collect_spark.data.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, 10, "x") for i in range(10)], ["doc_id", "n_tokens", "text"]
    )
    out = sorted(
        (r["id"], r["start_offset"]) for r in pack_sequences(docs, 32, order="id").collect()
    )
    assert out == [(i, 10 * i) for i in range(10)]


def test_mix_corpus_matches_python(spark):
    import hashlib

    from signal_collect_spark.data.packing import mix_corpus

    rows = [
        (i, f"s{i % 3}", " ".join(["tok"] * ((i * 7) % 23 + 1))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    weights = {"s0": 0.6, "s1": 0.4}  # s2 absent -> contributes nothing
    budget = 150
    got = sorted(tuple(r) for r in mix_corpus(docs, weights, budget).collect())

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    exp = []
    for src, w in weights.items():
        quota = int(round(w * budget))
        mine = sorted(
            (r for r in rows if r[1] == src), key=lambda r: (h60(f"mix|{r[0]}"), r[0])
        )
        cum = 0
        for did, _, text in mine:
            n = len(text.split(" "))
            if cum < quota:
                exp.append((did, src, n, cum, quota))
            cum += n
    assert got == sorted(exp)
    assert all(r[1] != "s2" for r in got)
    # each source's selected token mass reaches its quota (data permits)
    per = {}
    for _, src, n, _, q in got:
        per.setdefault(src, [0, q])[0] += n
    for src, (tot, q) in per.items():
        assert tot >= q, (src, tot, q)


def test_mix_corpus_empty_budget_and_validation(spark):
    import pytest as _pytest

    from signal_collect_spark.data.packing import mix_corpus

    docs = spark.createDataFrame([(1, "a", "x y")], ["doc_id", "source", "text"])
    assert mix_corpus(docs, {"a": 1.0}, 0).count() == 0
    with _pytest.raises(ValueError):
        mix_corpus(docs, {}, 100)
