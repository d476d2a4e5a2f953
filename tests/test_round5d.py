"""Round-5 additions (third batch): eigenvector centrality, graph
structure statistics (assortativity / reciprocity), neighborhood
Jaccard link prediction, BM25 ranking, bigram cross-entropy, and
token-window chunking — each checked against an independent
pure-Python replica."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.eigen import eigencentrality
from signal_collect_spark.algorithms.graphstats import (
    degree_assortativity,
    reciprocity,
)
from signal_collect_spark.algorithms.linkpred import jaccard_neighbors
from signal_collect_spark.data.index import bm25_topk
from signal_collect_spark.data.packing import chunk_documents
from signal_collect_spark.data.textstats import bigram_xent

# --------------------------------------------------------------------
# eigenvector centrality
# --------------------------------------------------------------------

# directed triangle plus a feeder vertex: the cycle carries all the
# eigenvector mass, the feeder decays to 0
EIG_EDGES = [(1, 2), (2, 3), (3, 1), (9, 1)]


def _py_power(pairs, steps):
    verts = sorted({v for e in pairs for v in e})
    x = {v: 1.0 for v in verts}
    for _ in range(steps):
        nxt = {v: 0.0 for v in verts}
        for s, d in pairs:
            nxt[d] += x[s]
        x = nxt
    tot = sum(x.values())
    return {v: (x[v] / tot if tot > 0 else 0.0) for v in verts}


def test_eigen_matches_power_iteration(spark):
    edges = spark.createDataFrame(EIG_EDGES, "src long, dst long")
    out, info = eigencentrality(spark, edges, steps=5, num_partitions=4)
    got = {r["id"]: r["eigen"] for r in out.collect()}
    want = _py_power(EIG_EDGES, 5)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert info.supersteps == 5
    info.release()


def test_eigen_cycle_uniform(spark):
    # on a pure cycle every vertex keeps exactly 1/n
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    out, info = eigencentrality(spark, edges, steps=4, num_partitions=4)
    vals = [r["eigen"] for r in out.collect()]
    assert len(vals) == 6
    for v in vals:
        # eigen is rounded to 9 dp to pin the cross-engine hash
        assert v == pytest.approx(1 / 6, abs=5e-10)
    info.release()


def test_eigen_overflow_guard(spark):
    # one vertex with weighted in-degree 2^30: 3 steps * 30 bits > 52
    edges = spark.createDataFrame(
        [(i, 0, float(1 << 22)) for i in range(1, 257)],
        "src long, dst long, weight double",
    )
    with pytest.raises(ValueError, match="exact-integer window"):
        eigencentrality(spark, edges, steps=3)


# --------------------------------------------------------------------
# assortativity / reciprocity
# --------------------------------------------------------------------

# star (hub 0 <- leaves) plus a leaf-leaf edge: disassortative
GS_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 0), (4, 4)]


def _py_assort(pairs):
    und = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    adj = list(und) + [(b, a) for a, b in und]
    deg: dict[int, int] = {}
    for a, _ in adj:
        deg[a] = deg.get(a, 0) + 1
    xs = [float(deg[a]) for a, _ in adj]
    ys = [float(deg[b]) for _, b in adj]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    return len(und), cov / (sx * sy)


def test_assortativity_matches_replica(spark):
    edges = spark.createDataFrame(GS_EDGES, "src long, dst long")
    row = degree_assortativity(edges).first()
    n_want, r_want = _py_assort(GS_EDGES)
    assert row["n_edges"] == n_want
    assert row["assortativity"] == pytest.approx(r_want, abs=1e-6)


def test_reciprocity_counts(spark):
    # 1->2 reciprocated, 2->3 not, self-loop dropped, dup edge collapsed
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (2, 3), (7, 7)], "src long, dst long"
    )
    row = reciprocity(edges).first()
    assert row["n_edges"] == 3
    assert row["n_reciprocated"] == 2
    assert row["reciprocity"] == pytest.approx(2 / 3)


# --------------------------------------------------------------------
# neighborhood Jaccard
# --------------------------------------------------------------------


def test_jaccard_neighbors_matches_replica(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = {
        (r["u"], r["w"]): (r["cn"], r["jaccard"])
        for r in jaccard_neighbors(edges).collect()
    }
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for w in verts[i + 1 :]:
            if (u, w) in und:
                continue
            cn = len(adj[u] & adj[w])
            if cn >= 1:
                want[(u, w)] = (cn, cn / len(adj[u] | adj[w]))
    assert out.keys() == want.keys()
    for k, (cn, jac) in want.items():
        assert out[k][0] == cn
        assert out[k][1] == pytest.approx(jac, abs=1e-12)


def test_jaccard_center_cap_prunes_hub_wedges(spark):
    # hub 0 with 5 leaves; cap 4 excludes the hub as a wedge center,
    # so no leaf-leaf candidates survive
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    assert jaccard_neighbors(edges, max_center_degree=4).count() == 0
    assert jaccard_neighbors(edges, max_center_degree=5).count() == 10


# --------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple cherry cherry durian"),
    (4, "banana banana banana"),
]


def _py_bm25(docs, k1=1.2, b=0.75, min_df=2):
    tf: dict[tuple[int, str], int] = {}
    dl: dict[int, int] = {}
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        dl[i] = len(toks)
        for t in toks:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    N = len(docs)
    avgdl = sum(dl.values()) / len(dl)
    out = {}
    for (i, t), c in tf.items():
        if df[t] < min_df:
            continue
        idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        out[(t, i)] = round(
            idf * c * (k1 + 1.0) / (c + k1 * (1 - b + b * dl[i] / avgdl)), 6
        )
    return out


def test_bm25_matches_replica(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, k=10, min_df=2).collect()
    want = _py_bm25(DOCS)
    got = {(r["term"], r["id"]): r["bm25"] for r in rows}
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-6)


def test_bm25_topk_cut_is_deterministic(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, k=1, min_df=2).collect()
    want = _py_bm25(DOCS)
    for r in rows:
        # the kept doc is the max-scoring (then lowest-id) doc for the term
        best_score, neg_id = max(
            (s, -i) for (t, i), s in want.items() if t == r["term"]
        )
        assert r["id"] == -neg_id
        assert r["bm25"] == pytest.approx(best_score, abs=2e-6)


# --------------------------------------------------------------------
# bigram cross-entropy
# --------------------------------------------------------------------


def _py_bigram_xent(docs, add_k=0.5):
    pair_c: dict[tuple[str, str], int] = {}
    uni: dict[str, int] = {}
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for i, text in docs:
        toks = text.split(" ")
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        ps = list(zip(toks, toks[1:]))
        per_doc[i] = ps
        for p in ps:
            pair_c[p] = pair_c.get(p, 0) + 1
    V = len(uni)
    out = {}
    for i, ps in per_doc.items():
        if not ps:
            out[i] = (0, None)
            continue
        h = -sum(
            math.log2((pair_c[p] + add_k) / (uni[p[0]] + add_k * V)) for p in ps
        ) / len(ps)
        out[i] = (len(ps), round(h, 6))
    return out


def test_bigram_xent_matches_replica(spark):
    data = DOCS + [(5, "solo")]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    rows = bigram_xent(docs).collect()
    want = _py_bigram_xent(data)
    got = {r["id"]: (r["n_pairs"], r["xent_bits"]) for r in rows}
    assert got.keys() == want.keys()
    for i, (n, h) in want.items():
        assert got[i][0] == n
        if h is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(h, abs=2e-6)


def test_bigram_xent_orders_scrambled_text_higher(spark):
    # same bag of words; scrambled order must score strictly higher
    fluent = "the cat sat on the mat " * 6
    scrambled = "mat the on sat cat the " * 6
    docs = spark.createDataFrame(
        [(1, fluent.strip()), (2, scrambled.strip()), (3, fluent.strip())],
        "doc_id long, text string",
    )
    got = {r["id"]: r["xent_bits"] for r in bigram_xent(docs).collect()}
    assert got[2] > got[1]


# --------------------------------------------------------------------
# token-window chunking
# --------------------------------------------------------------------


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, 4, stride=3, min_tokens=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0,3,6,9 -> windows [0..3],[3..6],[6..9],[9]
    assert [(r["chunk_idx"], r["start_tok"], r["n_tokens"]) for r in rows] == [
        (0, 0, 4),
        (1, 3, 4),
        (2, 6, 4),
        (3, 9, 1),
    ]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[3]["chunk_text"] == "t9"
    # every token is covered by at least one window
    covered = set()
    for r in rows:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(10))


def test_chunk_documents_min_tokens_drops_short_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, 4, stride=3, min_tokens=2).collect()
    assert len(rows) == 3  # the 1-token tail at start 9 is dropped


def test_chunk_documents_nonoverlapping_default(spark):
    text = " ".join(str(i) for i in range(9))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, 3).collect()
    assert sorted(r["chunk_text"] for r in rows) == ["0 1 2", "3 4 5", "6 7 8"]


def test_chunk_documents_validates_args(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, min_tokens=5)
