"""Redirect resolution (pointer doubling) vs a pure-Python chaser:
chains, cycles, tails feeding cycles, self-loops, duplicate sources,
and the O(log L) round count."""

from __future__ import annotations

from signal_collect_spark.algorithms.redirects import resolve_redirects


def _python_resolve(pairs):
    ptr = {}
    for s, d in pairs:
        ptr[s] = min(d, ptr.get(s, d))
    out = {}
    for s in ptr:
        cur, hops, seen = s, 0, set()
        while cur in ptr and cur not in seen:
            seen.add(cur)
            cur = ptr[cur]
            hops += 1
        if cur in ptr:  # stopped because we looped
            out[s] = (None, None, True)
        else:
            out[s] = (cur, hops, False)
    return out


def _collect(df):
    return {
        r["src"]: (r["final"], r["hops"], r["is_cycle"]) for r in df.collect()
    }


def _check(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out, info = resolve_redirects(spark, edges, num_partitions=2)
    assert _collect(out) == _python_resolve(pairs)
    return info


def test_plain_chains(spark):
    # 1->2->3->4->5 (terminal), 10->11 (terminal)
    _check(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])


def test_cycle_and_feeding_tail(spark):
    # 1->2->3->1 cycle; 9->1 feeds the cycle; 20->21 plain
    _check(spark, [(1, 2), (2, 3), (3, 1), (9, 1), (20, 21)])


def test_self_redirect_is_cycle(spark):
    _check(spark, [(5, 5), (1, 5)])


def test_duplicate_sources_keep_min_dst(spark):
    # 1 observed redirecting to both 7 and 3 -> min dst 3 wins
    _check(spark, [(1, 7), (1, 3), (3, 4)])


def test_long_chain_uses_log_rounds(spark):
    n = 60
    pairs = [(i, i + 1) for i in range(n)]  # chain of 60 hops
    info = _check(spark, pairs)
    # doubling: pointer advances 2^k hops; 60 resolves within 7 rounds
    # (+1 round to observe the stall/zero)
    assert info.supersteps <= 8, info.per_step


def test_empty_input(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out, info = resolve_redirects(spark, edges)
    assert out.count() == 0


def test_no_cache_leak(spark):
    spark.catalog.clearCache()
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 4)], "src long, dst long")
    out, _ = resolve_redirects(spark, edges, num_partitions=2)
    out.count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "resolve_redirects left DataFrames cached"
