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


# ---------------------------------------------------------------------------
# real multimodal codecs (r2 verdict #4)
# ---------------------------------------------------------------------------


def test_bmp_codec_roundtrip_exact():
    import numpy as np

    from signal_collect_spark.data import codecs as CC

    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:  # incl. padded widths
        px = ((np.arange(h * w).reshape(h, w) * 37 + 11) % 256).astype(np.uint8)
        payload = CC.encode_bmp_gray(px)
        assert payload[:2] == b"BM"
        back = CC.decode_bmp_gray(payload)
        assert back.shape == (h, w)
        assert (back == px).all()  # incl. row order (BMP stores bottom-up)


def test_wav_codec_roundtrip_exact():
    import numpy as np

    from signal_collect_spark.data import codecs as CC

    s = ((np.arange(777, dtype=np.int64) * 313) % 65536 - 32768).astype(np.int16)
    payload = CC.encode_wav_pcm16(s, 16_000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    back, rate = CC.decode_wav_pcm16(payload)
    assert rate == 16_000
    assert (back == s).all()


def test_media_stats_over_real_payloads(spark):
    import numpy as np

    from signal_collect_spark.data import multimodal as M

    media = M.make_media_fixture(spark, n=9)
    ist = {r["media_id"]: r for r in M.image_stats(media.filter("kind='image'")).collect()}
    m0 = media.filter("media_id = 0").first()
    h, w = m0["meta"]["height"], m0["meta"]["width"]
    px = ((np.arange(h * w).reshape(h, w) * 7) % 256).astype(np.int64)  # i=0 pattern
    assert (ist[0]["width"], ist[0]["height"]) == (w, h)
    assert ist[0]["pixel_sum"] == int(px.sum())
    assert ist[0]["row0_sum"] == int(px[0].sum())  # top row => un-flip is right

    ast = {r["media_id"]: r for r in M.audio_stats(media.filter("kind='audio'")).collect()}
    ns = 64 + 1
    s = ((np.arange(ns, dtype=np.int64) * 32) % 4096 - 2048).astype(np.int64)  # i=1
    assert ast[1]["n_samples"] == ns and ast[1]["sample_rate"] == 8000
    assert ast[1]["sample_sum"] == int(s.sum()) and ast[1]["max_sample"] == int(s.max())


def test_checkpoint_manifest_and_tag_guard(spark, tmp_path):
    """r2 verdict #8: every checkpoint writes a manifest (superstep,
    rows, sum_state, schema fingerprint, tag); restore REFUSES a tag
    mismatch — resuming a fixpoint onto a changed input."""
    from signal_collect_spark.checkpoint import CheckpointManager

    d = str(tmp_path / "ck")
    state = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, state double")
    ck = CheckpointManager(spark, d, tag="edge_log_v0")
    ck.save(state, superstep=5)
    m = ck.manifest()
    assert m["superstep"] == 5 and m["rows"] == 2 and m["sum_state"] == 5.0
    assert m["tag"] == "edge_log_v0" and "id" in m["schema"]

    # same tag restores; grown-input tag refuses
    restored, step = CheckpointManager(spark, d, tag="edge_log_v0").restore()
    assert step == 5 and restored.count() == 2
    with pytest.raises(ValueError, match="tag mismatch"):
        CheckpointManager(spark, d, tag="edge_log_v1").restore()
    # a tag-less manager stays backward compatible
    assert CheckpointManager(spark, d).restore()[1] == 5


def test_rank_refresh_refuses_grown_edge_log(spark, tmp_path):
    from signal_collect_spark import fixtures as FX
    from signal_collect_spark import streaming as ST

    log_dir, ck = str(tmp_path / "log"), str(tmp_path / "ck")
    edges = FX.edges_df(spark, FX.star5())
    edges.write.parquet(f"{log_dir}/batch_id=0")
    state, info = ST.rank_refresh(
        spark, log_dir, ck, max_steps=4, converge_tol=0.0, check_every=2,
        checkpoint_every=2, num_partitions=4,
    )
    info.release()
    # grow the log: same engine checkpoint dir must now refuse to resume
    edges.selectExpr("src + 10 as src", "dst + 10 as dst", "weight").write.parquet(
        f"{log_dir}/batch_id=1"
    )
    with pytest.raises(ValueError, match="tag mismatch"):
        ST.rank_refresh(
            spark, log_dir, ck, max_steps=4, converge_tol=0.0, check_every=2,
            checkpoint_every=2, num_partitions=4,
        )


def test_facade_add_edges_batches_dedup(spark):
    """r2 verdict #9: N add_edge calls must produce ONE union+distinct
    at the next read boundary, not one shuffle per call."""
    from signal_collect_spark import build_graph

    g = build_graph(spark, num_partitions=4)
    g.add_edge(0, 1).add_edge(1, 2).add_edge(2, 0).add_edge(0, 1)  # dup add
    assert len(g._pending) == 4  # nothing flushed yet
    plan = g.edges._jdf.queryExecution().optimizedPlan().toString()
    # one dedup pass (Catalyst plans distinct as a group-all Aggregate)
    # over ONE union — not a union+dedup per add_edge call
    assert plan.startswith("Aggregate")
    assert plan.count("Union") == 1 and plan.count("Aggregate") == 1
    assert g.edges.count() == 3
    ranks, info = g.execute("pagerank", max_steps=4, converge_tol=0.0, check_every=4)
    assert ranks.count() == 3
    g.shutdown()


def test_ivf_hash_sampling_decorrelates(spark):
    """r2 verdict #6: ids sorted BY CLUSTER (the realistic crawl/shard-
    order correlation) must not bias the quantizer sample. The sample
    (64) is smaller than the first cluster (100), so id-order sampling
    would see ONLY cluster 0 (measured coverage of clusters 1-3 then:
    cos <= 0.04); hash-order covers all four (cos >= 0.9 each)."""
    import numpy as np

    from signal_collect_spark.data import similarity as S

    rng = np.random.default_rng(7)
    rows = []
    for c in range(4):
        axis = np.zeros(8)
        axis[c * 2] = 1.0
        for i in range(100):
            v = axis + rng.normal(0, 0.05, 8)
            rows.append((c * 100 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = S.ivf_train(emb, n_centroids=4, dim=8, sample=64, iters=8)
    for c in range(4):
        axis = np.zeros(8)
        axis[c * 2] = 1.0
        assert float((np.asarray(cents) @ axis).max()) > 0.9, f"cluster {c} uncovered"


def test_embedding_neardup_exact_and_lsh(spark):
    """Embedding-cosine near-dup pairs: exact mode matches a numpy
    all-pairs oracle; LSH mode returns a SUBSET of it (verified pairs
    only) and recovers every planted near-duplicate."""
    import numpy as np

    from signal_collect_spark.data import similarity as S

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 16))
    vecs = list(base)
    # plant 10 near-dups of the first 10 vectors (ids 100+i)
    ids = list(range(30))
    for i in range(10):
        vecs.append(base[i] + rng.normal(0, 0.005, 16))
        ids.append(100 + i)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )
    m = np.stack(vecs)
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    c = n @ n.T
    truth = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if c[i, j] >= 0.9
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_neardup_pairs(emb, threshold=0.9, mode="exact", dim=16).collect()
    }
    assert exact == truth and len(truth) >= 10

    lsh = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_neardup_pairs(
            emb, threshold=0.9, mode="lsh", dim=16, n_planes=6, n_probes=7
        ).collect()
    }
    assert lsh <= exact
    planted = {(i, 100 + i) for i in range(10)}
    assert planted <= lsh  # every planted near-dup recovered


def test_sessionize_boundary_exact_gap(spark, tmp_path):
    """ADVICE r2 asked to pin down the exact-gap boundary. Measured:
    session_window MERGES an event exactly gap_seconds after the
    previous one (closed gap boundary) — so the stateful operator's
    strict `>` is the matching semantics. Both operators must agree;
    a strictly larger gap must split."""
    import datetime as dt

    from signal_collect_spark import streaming as ST

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=1800), 2.0),      # exact gap: merges
        (1, base + dt.timedelta(seconds=1800 * 2 + 1), 4.0),  # gap+1s: splits
        (2, base, 7.0),
    ]
    df = spark.createDataFrame(
        [(i, t, u, "click", v, "{}") for i, (u, t, v) in enumerate(rows)],
        ST.EVENT_SCHEMA,
    )
    nat = {
        (r["user_id"], r["n_events"], r["sum_value"], r["session_seconds"])
        for r in ST.sessionize_native(df, gap_seconds=1800).collect()
    }
    assert nat == {(1, 2, 3.0, 1800.0), (1, 1, 4.0, 0.0), (2, 1, 7.0, 0.0)}

    d = str(tmp_path / "ev")
    df.write.parquet(d)
    q = (
        ST.sessionize(ST.read_event_stream(spark, d), gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("s_boundary")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    closed = {
        (r["user_id"], r["n_events"], r["sum_value"], r["session_seconds"])
        for r in spark.sql("select * from s_boundary").collect()
    }
    # the first (2-event, exact-gap-merged) session closes in-batch when
    # the gap+1s event arrives — identical grouping to session_window
    assert closed == {(1, 2, 3.0, 1800.0)}


def test_auto_num_partitions(spark):
    """num_partitions="auto" sizes P from the edge count with a
    defaultParallelism floor and produces results identical to a pinned
    run (partitioning never changes the computed values)."""
    from pyspark.sql import functions as F

    from signal_collect_spark.algorithms import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(50)], "src long, dst long"
    ).filter("src != dst").withColumn("weight", F.lit(1.0))
    auto, ia = pagerank(spark, edges, max_steps=5, num_partitions="auto")
    pinned, ip = pagerank(spark, edges, max_steps=5, num_partitions=4)
    a = {r["id"]: r["rank"] for r in auto.collect()}
    p = {r["id"]: r["rank"] for r in pinned.collect()}
    assert a.keys() == p.keys()
    for k in a:
        assert abs(a[k] - p[k]) < 1e-12
    ia.release()
    ip.release()


def test_y4m_codec_roundtrip():
    """Y4M (Cmono) encode/decode is exact, including frame order and
    unknown header/frame parameters per the YUV4MPEG2 spec."""
    import numpy as np

    from signal_collect_spark.data import codecs as CC

    fr = ((np.arange(5 * 7 * 9).reshape(5, 7, 9) * 13) % 256).astype(np.uint8)
    payload = CC.encode_y4m_mono(fr, fps=(30, 1))
    assert payload.startswith(b"YUV4MPEG2 W9 H7 F30:1")
    back, fps = CC.decode_y4m_mono(payload)
    assert fps == (30, 1)
    assert back.shape == (5, 7, 9)
    assert (back == fr).all()
    # tolerate unknown stream params + frame params (spec allows both)
    tweaked = payload.replace(b" Cmono\n", b" Cmono Xcustom\n", 1).replace(
        b"FRAME\n", b"FRAME Ip\n", 1
    )
    back2, _ = CC.decode_y4m_mono(tweaked)
    assert (back2 == fr).all()
    # chroma-subsampled streams must not silently decode garbage
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        CC.decode_y4m_mono(b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + b"\0" * 6)


def test_video_stats_and_frame_sample(spark):
    """video_stats decodes the fixture's REAL Y4M payloads (frame0_sum
    proves frame order); sample_frames_decode emits BMP frames that
    compose with the image operators."""
    import numpy as np

    from signal_collect_spark.data import multimodal as M

    media = M.make_media_fixture(spark, n=9)
    vids = media.filter("kind = 'video'")
    vs = {r["media_id"]: r for r in M.video_stats(vids).collect()}
    assert set(vs) == {2, 5, 8}
    nf, h, w = 12, 6, 8  # media_id=2: n_frames=10+i, pattern *(i+3)
    fr = ((np.arange(nf * h * w).reshape(nf, h, w) * 5) % 256).astype(np.int64)
    assert (vs[2]["n_frames"], vs[2]["width"], vs[2]["height"]) == (nf, w, h)
    assert vs[2]["pixel_sum"] == int(fr.sum())
    assert vs[2]["frame0_sum"] == int(fr[0].sum())

    sampled = M.sample_frames_decode(vids, every_n=4)
    rows = {(r["media_id"], r["frame_idx"]): r for r in sampled.collect()}
    assert sorted(i for m, i in rows if m == 2) == [0, 4, 8]
    assert rows[(2, 4)]["frame_sum"] == int(fr[4].sum())
    # the sampled frame_bmp column feeds image_stats directly
    from pyspark.sql import functions as F

    as_images = sampled.select(
        (F.col("media_id") * 100 + F.col("frame_idx")).alias("media_id"),
        F.col("frame_bmp").alias("payload"),
        F.struct(
            F.col("width"), F.col("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("bmp8").alias("codec"),
        ).alias("meta"),
    )
    ist = {r["media_id"]: r for r in M.image_stats(as_images).collect()}
    assert ist[204]["pixel_sum"] == int(fr[4].sum())
    assert ist[204]["row0_sum"] == int(fr[4][0].sum())


def test_hamiltonian_reference_graph(spark):
    """The reference's own 5-vertex example (Hamiltonian.scala:34-53):
    per-vertex longest simple path + min weight, checked against a
    Python brute-force enumeration."""
    from itertools import permutations

    from pyspark.sql import functions as F

    from signal_collect_spark.algorithms import hamiltonian_paths

    # a=0 b=1 c=2 d=3 e=4; bidirectional weights from the reference
    und = [(0, 3, 3), (0, 1, 1), (3, 1, 2), (3, 2, 1), (1, 2, 1), (4, 0, 1)]
    tuples = [(a, b, float(w)) for a, b, w in und] + [
        (b, a, float(w)) for a, b, w in und
    ]
    adj = {(a, b): w for a, b, w in tuples}
    edges = spark.createDataFrame(tuples, "src long, dst long, weight double")
    got = {
        r["id"]: (r["path_len"], r["min_weight"], list(r["path"]))
        for r in hamiltonian_paths(spark, edges).collect()
    }

    best: dict[int, tuple] = {}
    for k in range(1, 6):
        for perm in permutations(range(5), k):
            w = 0
            ok = True
            for i in range(len(perm) - 1):
                if (perm[i], perm[i + 1]) not in adj:
                    ok = False
                    break
                w += adj[(perm[i], perm[i + 1])]
            if not ok:
                continue
            end = perm[-1]
            cand = (len(perm), -w, [-x for x in perm])
            if end not in best or cand > best[end]:
                best[end] = cand
    want = {
        e: (ln, -nw, [-x for x in np]) for e, (ln, nw, np) in best.items()
    }
    assert got == want, (got, want)
    # the graph HAS a Hamiltonian path (reference's point): length 5
    assert max(v[0] for v in got.values()) == 5


def test_sudoku_propagation_and_search(spark):
    """sudoku1 (Sudoku.scala:68-73) solves by pure propagation;
    sudoku2 (:76-81) needs the DFS fallback — both yield valid
    complete grids consistent with their givens."""
    from signal_collect_spark.algorithms import SUDOKU1, SUDOKU2, sudoku

    for givens, needs_search in ((SUDOKU1, False), (SUDOKU2, True)):
        grid = {
            r["cell"]: r["value"]
            for r in sudoku(spark, givens, search_fallback=True).collect()
        }
        assert len(grid) == 81 and all(1 <= v <= 9 for v in grid.values())
        for c, v in givens.items():
            assert grid[c] == v
        for unit in (
            [[r * 9 + c for c in range(9)] for r in range(9)]
            + [[r * 9 + c for r in range(9)] for c in range(9)]
            + [
                [(br * 3 + r) * 9 + bc * 3 + c for r in range(3) for c in range(3)]
                for br in range(3)
                for bc in range(3)
            ]
        ):
            assert sorted(grid[c] for c in unit) == list(range(1, 10))
    # propagation alone must solve sudoku1
    g1 = {
        r["cell"]: r["value"]
        for r in sudoku(spark, SUDOKU1, search_fallback=False).collect()
    }
    assert len(g1) == 81


def test_crawler_extract_and_depth(spark):
    """Link extraction uses the reference's hyperlink regex (double- or
    single-quoted hrefs); crawl discovers min-depth BFS bounded by
    max_depth, and pages at the depth limit are not fetched."""
    from signal_collect_spark.algorithms import crawl, extract_links

    web = spark.createDataFrame(
        [
            ("a", '<p><a href="b">x</a> junk <a href=\'c\'>y</a></p>'),
            ("b", '<a href="d">z</a>'),
            ("c", '<a href="d">z</a><a href="a">back</a>'),
            ("d", '<a href="e">deep</a>'),
            ("e", ""),
        ],
        "url string, html string",
    )
    links = {(r["src"], r["dst"]) for r in extract_links(web).collect()}
    assert links == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("c", "a"), ("d", "e")}

    vertices, edges = crawl(spark, web, seeds=["a"], max_depth=2)
    depth = {r["url"]: r["depth"] for r in vertices.collect()}
    assert depth == {"a": 0, "b": 1, "c": 1, "d": 2}  # e beyond the bound
    e = {(r["src"], r["dst"]) for r in edges.collect()}
    assert e == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("c", "a")}  # d not fetched


def test_bpe_token_count(spark):
    """BPE-ish pre-tokenizer counts: contractions split, punctuation
    separate, whitespace free; whitespace count rides alongside."""
    from signal_collect_spark.data import textstats as TS

    docs = spark.createDataFrame(
        [(0, "I'll see 42 cats!"), (1, ""), (2, "a  b")],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["n_bpe_tokens"], r["n_ws_tokens"]) for r in TS.bpe_token_count(docs).collect()}
    # I | 'll | " see" | " 42" | " cats" | ! -> 6 bpe; 4 ws tokens
    assert got[0] == (6, 4)
    assert got[1] == (0, 1)  # split('') -> ['']
    assert got[2] == (2, 3)  # "a", " b" (2nd space is a ws run); ws split: a,'',b


def test_crawl_pagerank_composition(spark):
    """WebCrawler's full shape: discovery + PageRank over the
    discovered subgraph; ranks are the standard engine's (cross-checked
    on the known 4-vertex discovered graph)."""
    from signal_collect_spark.algorithms import crawl_pagerank

    web = spark.createDataFrame(
        [
            ("a", '<a href="b">x</a><a href=\'c\'>y</a>'),
            ("b", '<a href="d">z</a>'),
            ("c", '<a href="d">z</a>'),
            ("d", ""),
        ],
        "url string, html string",
    )
    out = {r["url"]: (r["depth"], r["rank"]) for r in
           crawl_pagerank(spark, web, seeds=["a"], max_depth=3,
                          converge_tol=1e-9, num_partitions=4).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert [out[u][0] for u in "abcd"] == [0, 1, 1, 2]
    # a gets no in-links: rank 0.15; b,c get 0.15+0.85*(0.15/2) each;
    # d collects both: 0.15+0.85*(2*rank_b/1)... fixpoint values:
    rb = 0.15 + 0.85 * (0.15 / 2)
    rd = 0.15 + 0.85 * (rb + rb)
    assert abs(out["a"][1] - 0.15) < 1e-6
    assert abs(out["b"][1] - rb) < 1e-6 and abs(out["c"][1] - rb) < 1e-6
    assert abs(out["d"][1] - rd) < 1e-6


def test_repetition_stats(spark):
    """Gopher-style repetition: 'a b a b c' bigrams = [a b, b a, a b,
    b c] -> 4 grams, 3 distinct, top count 2; one-word docs report
    zero grams with 0.0 fractions."""
    from signal_collect_spark.data import textstats as TS

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "x"), (2, "q q q q")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_grams"], round(r["dup_gram_frac"], 6), round(r["top_gram_frac"], 6))
        for r in TS.repetition_stats(docs, n=2).collect()
    }
    assert got[0] == (4, 0.25, 0.5)
    assert got[1] == (0, 0.0, 0.0)
    assert got[2] == (3, round(1 - 1 / 3, 6), 1.0)  # 'q q' x3
