"""Physical-plan shape assertions — the scale-critical properties:
parquet column pruning + filter pushdown, shuffle-hash signal join,
map-side partial aggregation, co-partitioned (exchange-free) state
update. These are the '.explain and iterate' guarantees frozen as
regression tests."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import fixtures as FX
from signal_collect_spark import graph as G
from signal_collect_spark.algorithms.pagerank import pagerank_kernel


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def superstep_plan(spark):
    edges = FX.edges_df(spark, FX.torus(5))
    norm = G.normalize_edges(edges).repartition(8, "src").persist()
    k = pagerank_kernel(0.0)
    state = k.init(G.vertices_from_edges(edges)).repartition(8, "id").persist()
    frontier = (
        state.filter("residual > 0")
        .select("id", k.value().alias("value"))
        .hint("shuffle_hash")
        .alias("f")
    )
    sig = frontier.join(norm.alias("e"), F.col("f.id") == F.col("e.src")).select(
        F.col("e.dst").alias("dst"),
        (F.col("f.value") * F.col("e.norm_weight")).alias("m"),
    )
    inbox = sig.groupBy("dst").agg(F.sum("m").alias("inbox")).select(
        F.col("dst").alias("__inbox_id"), "inbox"
    )
    joined = state.alias("s").join(
        inbox.hint("shuffle_hash").alias("i"),
        F.col("s.id") == F.col("i.__inbox_id"),
        "left",
    )
    plan = _plan(joined)
    norm.unpersist()
    state.unpersist()
    return plan


def test_signal_join_is_shuffle_hash(superstep_plan):
    # SMJ would re-sort the edge table every superstep
    assert "ShuffledHashJoin" in superstep_plan


def test_inbox_has_partial_aggregation(superstep_plan):
    # partial (map-side) + final HashAggregate pair = message combining
    assert superstep_plan.count("HashAggregate") >= 2


def test_no_cartesian_or_bnl_in_superstep(superstep_plan):
    assert "CartesianProduct" not in superstep_plan
    assert "BroadcastNestedLoopJoin" not in superstep_plan


def test_parquet_scan_prunes_columns(spark):
    # token_stats over documents must read only doc_id + text
    from signal_collect_spark.data.textstats import token_stats

    df = token_stats(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_parquet_filter_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_linenumber") == 1)
        .select("l_orderkey")
    )
    plan = _plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_linenumber" in pushed[0]


def test_ann_broadcasts_queries(spark):
    import numpy as np

    from signal_collect_spark.data.similarity import cosine_scores

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)
    plan = _plan(cosine_scores(emb, q))
    # the small query side must broadcast — a shuffle of the corpus
    # against 3 rows would be wrong at 10^9 vectors
    assert "BroadcastExchange" in plan


# --- round-4 operator plan shapes -----------------------------------------


def test_tfidf_topk_uses_window_group_limit(spark):
    """The per-doc top-k must ship only k survivors per group past the
    sort (WindowGroupLimit), not rank the full scored table."""
    from signal_collect_spark.data import textstats as TS

    docs = spark.createDataFrame([(0, "a b"), (1, "b c")], ["doc_id", "text"])
    plan = _plan(TS.tfidf_topk(docs, k=3))
    assert "WindowGroupLimit" in plan


def test_mix_corpus_windows_are_bucket_partitioned(spark):
    """No single-partition window at any corpus size: every window in
    the plan must be partitioned (the two-level prefix sum), never a
    global ORDER BY-only window."""
    from signal_collect_spark.data.packing import mix_corpus

    docs = spark.createDataFrame(
        [(i, "s0", "x y") for i in range(4)], ["doc_id", "source", "text"]
    )
    plan = _plan(mix_corpus(docs, {"s0": 1.0}, 10))
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan  # the prefix sum is window-based
    for args in specs:
        # an UNPARTITIONED window's spec starts directly with the order
        # spec ("col ASC NULLS FIRST, ..."); partitioned ones lead with
        # plain partition columns
        assert " ASC NULLS FIRST" not in args.split(",")[0], plan


def test_kmeans_assignment_has_no_python_udf(spark):
    """Assignment is JVM expression-only — no Arrow/Python eval in the
    scan path."""
    import struct

    from signal_collect_spark.data.clustering import kmeans

    rows = [
        (i, [struct.unpack("f", struct.pack("f", float(i + j)))[0] for j in range(4)])
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans(df, k=2, iters=1)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_project_bipartite_single_exchange_for_guard_and_gather(spark):
    """The hot-group window count and the collect_list gather must share
    ONE shuffle of the (group, item) projection (the LSH shape)."""
    rows = [(g, i) for g in range(4) for i in range(3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    from signal_collect_spark.graph import project_bipartite

    plan = _plan(project_bipartite(edges))
    # exchanges: one for distinct, one hashpartitioning(g) reused by
    # window + aggregate, one for the final (src, dst) pair count
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, plan


def test_contract_graph_has_partial_aggregation(spark):
    """The group-pair rollup must map-side combine (the group-pair
    domain is quadratically smaller than the edge domain) and stay
    expression-only."""
    edges = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    mapping = spark.createDataFrame([(1, 10), (2, 20)], "id long, group long")
    from signal_collect_spark.graph import contract_graph

    plan = _plan(contract_graph(edges, mapping, weight_col="weight"))
    assert "partial" in plan.lower(), plan
    assert "EvalPython" not in plan, plan


def test_adamic_adar_wedge_join_is_hash_equi_join(spark):
    """The wedge self-join keys on the CENTER id (equi) with n1<n2 as a
    join filter — never a CartesianProduct/BroadcastNestedLoop."""
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    from signal_collect_spark.algorithms.linkpred import adamic_adar

    plan = _plan(adamic_adar(edges))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_hyperball_round_has_partial_max_aggregation(spark):
    """One HyperBall superstep: the register-wise union must be a plain
    hash aggregate with map-side partial combine (registers are m
    TINYINT columns, not an array), no Python anywhere."""
    from signal_collect_spark.algorithms.neighborhood import _init_registers

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    verts = edges.selectExpr("src as id").union(edges.selectExpr("dst as id")).distinct()
    state = _init_registers(verts, 4)
    rcols = [f"r{j}" for j in range(16)]
    sig = edges.join(state, edges["src"] == state["id"], "inner").select(
        F.col("dst").alias("id"), *rcols
    )
    plan = _plan(sig.groupBy("id").agg(*[F.max(c).alias(c) for c in rcols]))
    assert "partial" in plan.lower(), plan
    assert "EvalPython" not in plan, plan


# --- round-4 (later sessions) operator plan shapes -------------------------


def test_prefix_jaccard_joins_are_equi(spark):
    """Candidate generation and verify must be hash equi-joins — a
    cartesian/BNL here is the quadratic all-pairs the prefix filter
    exists to avoid."""
    from signal_collect_spark.data.setjoin import prefix_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} w{i % 5} common") for i in range(8)],
        ["doc_id", "text"],
    )
    out = prefix_jaccard_pairs(docs, 0.5)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_inverted_index_caps_postings_before_collect(spark):
    """The top-postings cap must run as WindowGroupLimit (only k rows
    per term survive the sort) BEFORE any collect_list — a stopword
    term must never materialize its full posting array."""
    from signal_collect_spark.data.index import inverted_index

    docs = spark.createDataFrame([(0, "a b"), (1, "b c")], ["doc_id", "text"])
    plan = _plan(inverted_index(docs, top_postings=5))
    assert "WindowGroupLimit" in plan


def test_truss_support_is_equi_join_with_partial_agg(spark):
    """Per-round support = triangle equi-joins + a map-side-combined
    count keyed on the edge."""
    from signal_collect_spark.algorithms.truss import _support

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4)], ["a", "b"]
    )
    plan = _plan(_support(e))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_temporal_callable_combine_stays_jvm(spark):
    """The callable edge_combine must compile to pure Column exprs —
    zero Python evaluation in the signal join."""
    from signal_collect_spark.algorithms.temporal import earliest_arrival_kernel

    k = earliest_arrival_kernel(0, 0.0)
    edges = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 9.0)], "src long, dst long, weight double"
    )
    frontier = spark.createDataFrame([(0, 0.0)], "id long, value double")
    sig = frontier.alias("f").join(
        edges.alias("e"), F.col("f.id") == F.col("e.src")
    ).select(
        F.col("e.dst").alias("dst"),
        __import__("signal_collect_spark.superstep", fromlist=["_combine_expr"])
        ._combine_expr(k.edge_combine, "f.value", "e.weight").alias("m"),
    )
    inbox = sig.groupBy("dst").agg(F.min("m").alias("inbox"))
    plan = _plan(inbox)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_wl_round_has_partial_aggregation(spark):
    """The per-round signature aggregate must partially combine
    map-side (ObjectHashAggregate for collect_list) and join colors on
    the id — no cartesian anywhere."""
    from signal_collect_spark.algorithms.wl import wl_colors

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    out, _ = wl_colors(spark, edges, rounds=1, num_partitions=4)
    # the returned DF is checkpointed; assert on a reconstructed round
    colors = out
    e = edges.unionAll(edges.selectExpr("dst as src", "src as dst")).distinct()
    nb = e.join(
        colors.selectExpr("id as dst", "color as ncolor"), "dst"
    ).select(F.col("src").alias("id"), "ncolor")
    sig = nb.groupBy("id").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("ncolor"))).alias("sig")
    )
    plan = _plan(sig)
    assert "CartesianProduct" not in plan
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_salsa_half_step_has_partial_aggregation(spark):
    """SALSA's half-steps must keep the PageRank-superstep plan shape:
    equi hash join + map-side-combined keyed sum, no cartesian."""
    edges = FX.edges_df(spark, FX.torus(4))
    base = edges.select("src", "dst").distinct()
    outd = base.groupBy("src").agg(F.count("*").alias("outdeg"))
    ind = base.groupBy("dst").agg(F.count("*").alias("indeg"))
    e = (
        base.join(outd, "src")
        .join(ind, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("outdeg")).alias("inv_out"),
            (F.lit(1.0) / F.col("indeg")).alias("inv_in"),
        )
    )
    auth = (
        e.select(F.col("dst").alias("id"))
        .distinct()
        .select("id", F.lit(0.5).alias("authority"))
    )
    hub = (
        e.join(auth.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src")
        .agg(F.sum(F.col("authority") * F.col("inv_in")).alias("hub"))
    )
    plan = _plan(hub)
    assert plan.count("HashAggregate") >= 2  # partial + final keyed sum
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_profile_prunes_to_group_and_text(spark):
    """The quantile profile must read only (source, text) from the
    documents scan — at 100 TB the other columns are pure I/O waste."""
    from signal_collect_spark.data.textstats import corpus_profile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(corpus_profile(docs))
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "source" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "doc_id" not in read_schema
    # exactly one shuffle for the grouped aggregate, none before it
    # (count tree-summary lines only — each node also reprints in the
    # formatted detail section)
    tree = [ln.lstrip("+- ") for ln in plan.splitlines() if ln.lstrip().startswith("+-")]
    assert sum(1 for ln in tree if ln.startswith("Exchange")) == 1
    # and the percentile sort-buffers are map-side combined (partial +
    # final ObjectHashAggregate around that single exchange)
    assert sum(1 for ln in tree if ln.startswith("ObjectHashAggregate")) == 2


def test_asof_join_is_single_window_no_join(spark):
    """The as-of union-sort trick must compile to ONE shuffle (the
    per-key window) and ZERO join operators — that's its whole
    advantage over the O(n·m) range join."""
    import datetime as dt

    from signal_collect_spark.data.temporal import asof_join

    ts = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 7, ts)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, ts, "a", 1.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    plan = _plan(asof_join(left, right))
    assert "Join" not in plan, plan  # matches *HashJoin / SortMergeJoin / NestedLoop
    assert "Window" in plan
    # count tree-summary lines only (formatted explain reprints each
    # node in the detail section)
    tree = [ln.lstrip("+- ") for ln in plan.splitlines() if ln.lstrip().startswith("+-")]
    assert sum(1 for ln in tree if ln.startswith("Exchange")) == 1, plan


def test_semdedup_pair_join_is_equi_hash(spark):
    """The within-cluster pair stage must be an equi join keyed on the
    cluster id — never a cartesian/nested-loop over the corpus."""
    from signal_collect_spark.data.clustering import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(semantic_dedup(emb, k=2, iters=1, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mis_round_has_partial_min_aggregation(spark):
    """The per-round neighbor-min must map-side combine (partial +
    final aggregate around one exchange), like every keyed reduction
    in the engine."""
    edges = FX.edges_df(spark, FX.torus(4))
    base = edges.select("src", "dst").distinct()
    verts = base.select(F.col("src").alias("id")).distinct().select(
        "id", F.xxhash64("id").alias("hk")
    )
    nm = (
        base.join(verts.select(F.col("id").alias("dst"), F.col("hk").alias("hk_d")), "dst")
        .groupBy("src")
        .agg(F.min(F.struct(F.col("hk_d").alias("hk"), F.col("dst").alias("id"))).alias("m"))
    )
    plan = _plan(nm)
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_interval_join_is_bucketed_equi_join(spark):
    """The containment join must go through the bucket equi key —
    a raw range predicate would fall back to BroadcastNestedLoopJoin
    and O(points x intervals) work."""
    from signal_collect_spark.data.temporal import interval_join

    pts = spark.range(0, 1000).select(
        F.col("id").alias("pid"), (F.col("id") * 37 % 5000).alias("ts")
    )
    ivs = spark.range(0, 50).select(
        (F.col("id") * 100).alias("start"), (F.col("id") * 100 + 60).alias("end")
    )
    plan = _plan(interval_join(pts, ivs, point_ts="ts", bucket_width=64))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # bucket equi join present


def test_ppr_push_round_stays_jvm_with_partial_agg(spark):
    """One push round = frontier filter -> edge equi join -> keyed sum
    with map-side combine; no Python UDF, no nested loop."""
    from signal_collect_spark.algorithms.ppr import ppr_push

    edges = FX.edges_df(spark, FX.torus(5))
    out, _ = ppr_push(
        spark,
        edges,
        spark.createDataFrame([(0,)], "id long"),
        eps=1e-3,
        max_rounds=1,
        run_to_convergence=False,
        num_partitions=4,
    )
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_crawl_schedule_single_host_shuffle(spark):
    """The politeness window must shuffle ONCE keyed on host (the
    per-host sequence is the politeness constraint itself)."""
    from signal_collect_spark.data.web import crawl_schedule

    df = spark.range(0, 200).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("url_norm"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com")).alias("host"),
    )
    plan = _plan(crawl_schedule(df, width=3))
    assert plan.count(") Exchange") == 1  # exactly one shuffle node
    assert "hashpartitioning(host" in plan
    assert "BatchEvalPython" not in plan


def test_bpe_pair_count_stays_jvm_with_partial_agg(spark):
    """A BPE round's pair counting must be pure expression (explode +
    groupBy with map-side combine) — no Python in the vocab loop."""
    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newer newest")],
        "doc_id long, text string",
    )
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .select(
            F.regexp_replace(F.col("word"), "(.)", "\x1f$1").alias("s"), "c"
        )
    )
    pairs = (
        words.withColumn(
            "toks", F.filter(F.split(F.col("s"), "\x1f"), lambda t: t != F.lit(""))
        )
        .where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS a, toks[i] AS b))"
                )
            ).alias("p"),
            "c",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("c").alias("cnt"))
    )
    plan = _plan(pairs)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_heavy_hitters_recount_is_broadcast_semi_join(spark):
    """Phase 2 must broadcast the bounded candidate set back as a
    LeftSemi filter — the long tail never shuffles."""
    docs = spark.createDataFrame(
        [(i, "hot hot cold w%d" % i) for i in range(20)],
        "doc_id long, text string",
    )
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token")).where(
        F.col("token") != ""
    )
    candidates = spark.createDataFrame([("hot",)], "token string")
    out = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_spectral_step_is_pagerank_shaped(spark):
    """A deflated power-iteration step = edge equi join + keyed sum with
    map-side combine + broadcast scalar; no cartesian on the data path
    (the only crossJoin is against the 1-row projection aggregate)."""
    from signal_collect_spark.algorithms.spectral import spectral_bisection

    edges = FX.edges_df(spark, FX.torus(4))
    out = spectral_bisection(spark, edges, steps=1, num_partitions=4)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar rides broadcast
