"""Distributed Lloyd k-means — pure-Python replay with the identical
pinned arithmetic (hash-order seeds, left-fold distances, 6-dp-rounded
means)."""

from __future__ import annotations

import hashlib

import pytest

from signal_collect_spark.data.clustering import kmeans


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_kmeans(rows, k, iters, seed="km|"):
    order = sorted(rows, key=lambda r: (_h60(f"{seed}{r[0]}"), r[0]))
    cents = [[float(x) for x in order[j][1]] for j in range(k)]

    def assign(cents):
        a = {}
        for i, v in rows:
            ds = []
            for c in cents:
                s = 0.0
                for x, y in zip(v, c):
                    s += (float(x) - y) * (float(x) - y)
                ds.append(s)
            a[i] = ds.index(min(ds))
        return a

    for _ in range(iters):
        a = assign(cents)
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for i, v in rows:
            cl = a[i]
            counts[cl] = counts.get(cl, 0) + 1
            sums.setdefault(cl, [0.0] * len(v))
            for j, x in enumerate(v):
                sums[cl][j] += float(x)
        for cl in sums:
            cents[cl] = [round(s / counts[cl], 6) for s in sums[cl]]
    return assign(cents)


def _blobs(n=30, dim=4):
    import struct

    rows = []
    for i in range(n):
        base = [0.0, 10.0, -10.0][i % 3]
        vec = [base + ((i * 7 + j) % 5) * 0.1 for j in range(dim)]
        rows.append(
            (i, [struct.unpack("f", struct.pack("f", v))[0] for v in vec])
        )
    return rows


def test_kmeans_matches_python_replay(spark):
    rows = _blobs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r["cluster"] for r in kmeans(df, k=3, iters=2).collect()}
    assert got == _py_kmeans(rows, 3, 2)
    # three separated blobs -> each blob lands wholly in one cluster
    by_blob: dict[int, set] = {}
    for i, _ in rows:
        by_blob.setdefault(i % 3, set()).add(got[i])
    assert all(len(v) == 1 for v in by_blob.values())


def test_kmeans_validation_and_cache_release(spark):
    rows = _blobs(n=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans(df, k=0)
    with pytest.raises(ValueError, match="fewer than k"):
        kmeans(df, k=10)
    spark.catalog.clearCache()
    out = kmeans(df, k=2, iters=1)
    assert out.count() == 6
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
