"""Side benchmarks for the r6 optimization round (guide §1.4).

NOT the frozen driver bench — this file isolates individual operators
(noop-sink style / wall-clock around the operator's own actions) and
supports config experiments. Usage:

    python bench_extra.py <op> [<op> ...]          # time listed ops
    SPARK_GRAFT_AQE=false python bench_extra.py pagerank

Prints one JSON line {op: seconds} to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from bench import BENCH_MOD, bench_graph
    from signal_collect_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra_conf = {"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g")}
    if os.environ.get("SPARK_GRAFT_AQE"):
        extra_conf["spark.sql.adaptive.enabled"] = os.environ["SPARK_GRAFT_AQE"]
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra_conf,
    )
    sc = spark.sparkContext

    ops = sys.argv[1:]
    out: dict[str, float] = {}
    edges = bench_graph(spark, sf_dir).persist()
    edges.count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def timed(name, fn, warm=False):
        if ops and name not in ops:
            return
        sc.setJobDescription(name)
        if warm:
            fn()
        t0 = time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
        print(f"{name}: {out[name]}s", file=sys.stderr, flush=True)

    # --- engine family ---
    def _pagerank():
        from signal_collect_spark.algorithms import pagerank

        _, info = pagerank(
            spark, edges, signal_threshold=1e-9, converge_tol=1e-6,
            max_steps=200, check_every=10, truncate_every=5,
        )
        info.release()

    def _pagerank_warm():
        from signal_collect_spark.algorithms import pagerank

        _, w = pagerank(spark, edges, signal_threshold=0.0, converge_tol=0.0,
                        max_steps=6, check_every=3)
        w.release()

    if not ops or "pagerank" in ops:
        _pagerank_warm()
    timed("pagerank", _pagerank)

    def _salsa():
        from signal_collect_spark.algorithms.salsa import salsa

        s, _ = salsa(spark, edges, steps=6)
        s.count()

    timed("salsa", _salsa, warm=True)

    def _mis():
        from signal_collect_spark.algorithms.mis import maximal_independent_set

        m, _ = maximal_independent_set(spark, edges, rounds=16, hash_fn="xxhash64")
        m.filter(F.col("status") == "in").count()

    timed("mis", _mis, warm=True)

    def _ppr():
        from signal_collect_spark.algorithms.ppr import ppr_push

        seeds = (
            edges.select(F.col("src").alias("id")).distinct()
            .filter(F.col("id") % 1000 == 0)
        )
        pout, _ = ppr_push(spark, edges, seeds, eps=1e-5, max_rounds=30)
        pout.filter(F.col("ppr") > 0).count()

    timed("ppr_push", _ppr, warm=True)

    def _tbfs():
        from signal_collect_spark.algorithms.temporal import earliest_arrival

        tedges = ev.select(
            (F.col("user_id") % 5000).alias("src"),
            ((F.col("user_id") + F.col("event_id")) % 5000).alias("dst"),
            F.unix_micros(F.col("ts").cast("timestamp")).cast("double").alias("weight"),
        ).filter(F.col("src") != F.col("dst"))
        tout, tinfo = earliest_arrival(spark, tedges, 0)
        tout.filter(F.col("arrival").isNotNull()).count()
        tinfo.release()

    timed("temporal_bfs", _tbfs, warm=True)

    def _cc():
        from signal_collect_spark.algorithms import connected_components

        comp, cinfo = connected_components(spark, edges, max_steps=100, check_every=5)
        comp.agg(F.countDistinct("component")).first()
        cinfo.release()

    timed("connected_components", _cc, warm=True)

    def _lp():
        from signal_collect_spark.algorithms import label_propagation

        lp, lpinfo = label_propagation(spark, edges, max_steps=5, run_to_convergence=False)
        lp.count()
        lpinfo.release()

    timed("label_propagation", _lp, warm=True)

    # --- data ops ---
    def _pj():
        from signal_collect_spark.data.setjoin import prefix_jaccard_pairs

        prefix_jaccard_pairs(docs, 0.9).count()

    timed("prefix_jaccard", _pj, warm=True)

    def _aa():
        from signal_collect_spark.algorithms.linkpred import adamic_adar

        adamic_adar(edges, max_center_degree=1000).count()

    timed("linkpred_aa", _aa, warm=True)

    def _wl():
        from signal_collect_spark.algorithms.richclub import rich_club
        from signal_collect_spark.algorithms.wl import wl_colors, wl_histogram

        wl_out, _i = wl_colors(spark, edges, rounds=3)
        wl_histogram(wl_out).count()
        rich_club(edges).count()

    timed("wl_richclub", _wl, warm=True)

    def _semdedup_asof():
        from signal_collect_spark.data.clustering import semantic_dedup
        from signal_collect_spark.data.temporal import asof_join

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        sd = semantic_dedup(emb, k=16, iters=2, threshold=0.3, hash_fn="xxhash64")
        sd.filter(~F.col("kept")).count()
        asof_join(
            ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts"),
            ev.filter(F.col("event_type") != "purchase").select(
                "user_id", "ts", "event_type", "value"
            ),
        ).count()

    timed("semdedup_asof", _semdedup_asof, warm=True)

    def _minhash():
        from signal_collect_spark.data import dedup as D

        D.minhash_lsh_candidates(docs, num_hashes=64, bands=16, hash_fn="xxhash64").count()

    timed("minhash_lsh", _minhash, warm=True)

    def _rw():
        from signal_collect_spark.algorithms import random_walks

        wout, winfo = random_walks(
            spark, edges, walk_len=4, walks_per_vertex=1, hash_fn="xxhash64"
        )
        wout.count()
        winfo.release()

    timed("random_walks", _rw, warm=True)

    def _tri():
        from signal_collect_spark.algorithms import triangle_count

        triangle_count(spark, edges)

    timed("triangle_count", _tri, warm=True)

    def _tfidf_mix():
        from signal_collect_spark.data import textstats as TS
        from signal_collect_spark.data.packing import mix_corpus

        TS.tfidf_topk(docs, k=3).count()
        mix_corpus(
            docs, {f"src{i}": 0.05 for i in range(20)}, 100_000, hash_fn="xxhash64"
        ).count()

    timed("tfidf_mix", _tfidf_mix, warm=True)

    def _multimodal():
        from bench import run_suite  # noqa: F401  (shape reference only)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
