"""TF-IDF top-k and degree distribution — checked against independent
pure-Python references."""

from __future__ import annotations

import math

from signal_collect_spark import aggregations as AGG
from signal_collect_spark.data import textstats as TS


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs and cats"),
    (3, "the the the the"),
    (4, "quantum flux capacitor"),
]


def _py_tfidf_topk(docs, k):
    tf: dict[tuple, int] = {}
    for did, text in docs:
        for t in text.split(" "):
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = float(len(docs))
    scored = [
        (did, t, c, df[t], round(c * math.log(n / df[t]), 6))
        for (did, t), c in tf.items()
    ]
    out = []
    for did in {d for d, _ in docs}:
        mine = sorted(
            (s for s in scored if s[0] == did), key=lambda s: (-s[4], s[1])
        )
        out.extend(mine[:k])
    return sorted(out)


def test_tfidf_matches_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(tuple(r) for r in TS.tfidf_topk(docs, k=2).collect())
    assert got == _py_tfidf_topk(DOCS, 2)


def test_tfidf_k_bounds_rows_per_doc(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = TS.tfidf_topk(docs, k=3).collect()
    per = {}
    for r in out:
        per[r["id"]] = per.get(r["id"], 0) + 1
    assert all(v <= 3 for v in per.values())
    # doc 3 has a single distinct term -> exactly one row
    assert per[3] == 1


def test_degree_distribution_matches_python(spark):
    pairs = [(0, i) for i in range(1, 9)] + [(1, 2), (1, 3), (2, 3), (5, 6)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["bin"]: (r["n_vertices"], r["min_deg"], r["max_deg"], r["sum_deg"])
           for r in AGG.degree_distribution(edges, "out").collect()}
    # out-degrees: 0 -> 8 (bin 3), 1 -> 2 (bin 1), 2 -> 1 (bin 0), 5 -> 1 (bin 0)
    assert got == {3: (1, 8, 8, 8), 1: (1, 2, 2, 2), 0: (2, 1, 1, 2)}
    tot = {r["bin"]: r["n_vertices"]
           for r in AGG.degree_distribution(edges, "total").collect()}
    # total degrees: 0:8 1:3 2:3 3:3 5:2 6:2 4:1 7:1 8:1 -> bins {3:1, 1:5, 0:3}
    assert tot == {3: 1, 1: 5, 0: 3}
