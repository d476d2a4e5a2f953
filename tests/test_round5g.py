"""Round-5 batch-5 additions: BPE vocabulary induction, Misra-Gries
heavy hitters, spectral bisection — each vs an independent pure-Python
replica or an exact oracle computation."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

# ---------------------------------------------------------------- bpe_train


def _bpe_replica(word_freqs, n_merges):
    """Sennrich-style reference BPE: overlapping adjacent-pair counts,
    max-count tie-broken lexicographically, greedy left-to-right apply
    (a merged token joins no further match in the same round — the
    semantics of sequential string replace)."""
    vocab = {tuple(w): c for w, c in word_freqs.items()}
    merges = []
    for r in range(1, n_merges + 1):
        pairs = collections.Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        # deterministic tie-break: max count, then lexicographic (a, b)
        top_cnt = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == top_cnt)
        merges.append((r, a, b, a + b, top_cnt))
        new_vocab = {}
        for toks, c in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return [(r, a, b, m, c) for r, a, b, m, c in merges]


def test_bpe_train_matches_replica(spark):
    texts = [
        "low low low lower lower lowest",
        "new newer newer newest wide wider widest",
        "low new lowest newest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from signal_collect_spark.data.bpe import bpe_train

    got = sorted(
        (r.merge_round, r.left_tok, r.right_tok, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=5).collect()
    )

    freqs = collections.Counter(w for t in texts for w in t.split(" ") if w)
    want = _bpe_replica(freqs, 5)
    assert [(g[0], g[1], g[2], g[3]) for g in got] == [
        (w[0], w[1], w[2], w[3]) for w in want
    ]
    assert [g[4] for g in got] == [w[4] for w in want]


def test_bpe_greedy_overlap_semantics(spark):
    # "aaaa": pair (a,a) counts 3 (overlapping), merge applies greedily
    # left-to-right -> "aa","aa"; round 2 then merges (aa,aa).
    docs = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    from signal_collect_spark.data.bpe import bpe_train

    rows = bpe_train(docs, n_merges=2).collect()
    assert [(r.merge_round, r.left_tok, r.right_tok, r.pair_count) for r in rows] == [
        (1, "a", "a", 3),
        (2, "aa", "aa", 1),
    ]


def test_bpe_apply_compression(spark):
    docs = spark.createDataFrame(
        [(0, "abab abab"), (1, "ab")], "doc_id long, text string"
    )
    from signal_collect_spark.data.bpe import bpe_apply

    out = {
        r.id: (r.n_tokens_char, r.n_tokens_bpe)
        for r in bpe_apply(docs, [("a", "b"), ("ab", "ab")]).collect()
    }
    # "abab" -> chars a,b,a,b -> (a,b) merges -> ab,ab -> (ab,ab) -> abab
    assert out[0] == (8, 2)
    assert out[1] == (2, 1)


# ------------------------------------------------------------ heavy_hitters


def test_heavy_hitters_exact_above_threshold(spark):
    # 'hot' 40/100 tokens, 'warm' 25/100, the rest unique fillers;
    # m=5 -> threshold N/5 = 20 -> exactly {hot, warm}.
    words = ["hot"] * 40 + ["warm"] * 25 + [f"w{i}" for i in range(35)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 10 : (i + 1) * 10])) for i in range(10)],
        "doc_id long, text string",
    ).repartition(8)
    from signal_collect_spark.data.frequency import heavy_hitters

    got = {(r.token, r.n_occurrences) for r in heavy_hitters(docs, m=5).collect()}
    assert got == {("hot", 40), ("warm", 25)}


def test_heavy_hitters_matches_exact_count(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from signal_collect_spark.data.frequency import heavy_hitters

    got = {(r.token, r.n_occurrences) for r in heavy_hitters(docs, m=30).collect()}
    toks = docs.select(F.explode(F.split("text", " ")).alias("t")).where(
        F.col("t") != ""
    )
    n = toks.count()
    want = {
        (r.t, r.c)
        for r in toks.groupBy("t")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > n / 30)
        .collect()
    }
    assert got == want
    assert len(got) >= 5  # non-vacuous: sf0.001 has 14 heavy hitters at m=30


# ------------------------------------------------------- spectral_bisection


def test_spectral_bisection_splits_barbell(spark):
    k1 = [(i, j) for i in range(6) for j in range(6) if i < j]
    k2 = [(10 + i, 10 + j) for i in range(6) for j in range(6) if i < j]
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in k1 + k2 + [(5, 10)]],
        "src long, dst long, weight double",
    )
    from signal_collect_spark.algorithms.spectral import spectral_bisection

    rows = spectral_bisection(spark, edges, steps=40, num_partitions=4).collect()
    side = {r.id: r.side for r in rows}
    assert len(rows) == 12
    assert len({side[i] for i in range(6)}) == 1
    assert len({side[10 + i] for i in range(6)}) == 1
    assert side[0] != side[10]
    # scaled to max|x| = 1: some vertex sits exactly at ±1 after rounding
    assert max(abs(r.fiedler) for r in rows) == 1.0
