"""Neighborhood function, harmonic centrality, and HyperBall.

Beyond-reference link-graph analytics. The reference's aggregation
surface answers one-hop questions (degree, TopK, Vicinities —
Graph.scala:66-90, aggregations here in aggregations.py); the
NEIGHBORHOOD FUNCTION NF(t) = Σ_v |B(v,t)| (how many pairs are within
distance t) and the centralities derived from it (harmonic/closeness,
effective diameter) are the standard multi-hop statistics computed on
web-scale link graphs.

Two tiers, same semantics:

* **Exact** (:func:`distance_pairs` → :func:`neighborhood_function` /
  :func:`harmonic_centrality`): multi-source BFS materializing every
  (v, u, dist) pair within ``max_t`` hops. O(V·V) output in the worst
  case — this is the VALIDATION tier (small graphs, DuckDB-checkable
  oracles), not the 100 TB path; the docring says so loudly.

* **HyperBall** (:func:`hyperball_harmonic`): Boldi–Sebastiano–Vigna
  (WebGraph/HyperANF lineage — public papers "HyperANF: Approximate
  Neighborhood Function" WWW'11 and "In-Core Computation of Geometric
  Centralities with HyperBall" ICDMW'13): each vertex carries a
  HyperLogLog sketch of its ball; one superstep unions each vertex's
  sketch with its neighbors' (register-wise max), so after t steps the
  sketch estimates |B(v,t)|. State per vertex is m = 2^p one-byte
  registers — O(V·m) total, independent of pair count — and each
  superstep is ONE equi-join + ONE hash aggregation. This is THE
  scale path: linear state, logarithmic-ish rounds (graph diameter).

Spark-first layout decision: the m registers are m separate TINYINT
COLUMNS, not an array — so the per-superstep register-wise max is a
plain ``groupBy(dst).agg(max(r_j)...)`` with map-side partial
aggregation (whole-stage codegen, no UDF, no collect_list buffering);
an array column would need a zip_with fold over collect_list (per-group
memory = bucket size) or an m-fold explode (m× shuffle volume).
Convergence is EXACT and free: registers are monotone non-decreasing,
so the sum of all registers strictly increases until the fixpoint —
one tiny aggregate per round, no fingerprint-collision risk.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from signal_collect_spark.superstep import ExecutionInfo


def _undirect(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


# ---------------------------------------------------------------------------
# exact tier (validation / oracle scale)
# ---------------------------------------------------------------------------


def distance_pairs(
    spark,
    edges: DataFrame,
    max_t: int,
    *,
    directed: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """All (v, u, dist) pairs with dist = d(v, u) <= max_t (dist 0 =
    self). EXACT multi-source BFS — O(V^2) pairs in the worst case;
    validation tier only (the scale path is :func:`hyperball_harmonic`).
    """
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst") if directed else _undirect(edges)
    e = e.repartition(P, "dst").persist()

    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    # reach: (v, u, dist) — v's ball member u at first-hit distance
    reach = verts.select("v", F.col("v").alias("u"), F.lit(0).alias("dist"))
    reach = reach.repartition(P, "v").localCheckpoint(eager=True)
    frontier = reach

    for t in range(1, max_t + 1):
        # expand: u --edge--> w lands w in v's ball at distance t unless
        # already reached earlier (left_anti = first-hit BFS property)
        grown = (
            frontier.join(e, frontier["u"] == e["src"], "inner")
            .select("v", F.col("dst").alias("u"))
            .distinct()
            .join(reach.select("v", "u"), ["v", "u"], "left_anti")
            .withColumn("dist", F.lit(t))
        )
        grown = grown.repartition(P, "v").localCheckpoint(eager=True)
        if grown.isEmpty():
            break
        reach = reach.unionByName(grown).localCheckpoint(eager=True)
        frontier = grown
    e.unpersist()
    return reach


def neighborhood_function(
    spark, edges: DataFrame, max_t: int, *, directed: bool = False
) -> DataFrame:
    """DF[t: int, nf: long] — NF(t) = #{(v,u) : d(v,u) <= t}, t=0..max_t
    (cumulative, NF(0) = |V|). Exact tier."""
    pairs = distance_pairs(spark, edges, max_t, directed=directed)
    per_d = pairs.groupBy("dist").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window as W

    w = W.orderBy("dist").rowsBetween(W.unboundedPreceding, 0)
    ts = spark.range(max_t + 1).select(F.col("id").cast("int").alias("t"))
    cum = per_d.select(
        F.col("dist").alias("t"), F.sum("cnt").over(w).alias("nf")
    )
    # forward-fill: NF is defined (and flat) past the diameter
    joined = ts.join(cum, "t", "left")
    wf = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    return joined.select(
        "t", F.last("nf", ignorenulls=True).over(wf).alias("nf")
    )


def effective_diameter(
    spark,
    edges: DataFrame,
    max_t: int,
    *,
    q: float = 0.9,
    directed: bool = False,
) -> DataFrame:
    """One-row DataFrame[n_pairs, d_q, d_q_interp, mean_dist] — the
    HADI / snap-style distance summary read off the neighborhood
    function (Kang et al., ICDM'08 "HADI: radii and diameters of
    massive graphs"):

    - ``d_q``: the smallest hop count t with NF(t) >= q * NF(max_t)
      (the q-effective diameter, q = 0.9 by convention),
    - ``d_q_interp``: its standard linear interpolation between
      NF(d_q - 1) and NF(d_q) — the fractional form papers report,
    - ``mean_dist``: the mean pairwise distance over reachable pairs
      with d >= 1 (from the NF deltas),
    - ``n_pairs``: NF(max_t), the reachable-pair count the quantile is
      taken against (max_t must be >= the true diameter for the exact
      figure; truncation makes it the <=max_t-conditional summary).

    Fractions are exact-long ratios rounded to 6 dp, so both engines
    land on the same grid. Scale note: this exact tier shares
    :func:`distance_pairs`'s O(V^2)-pairs validation scope; at link-
    graph scale the same read-out applies verbatim to
    :func:`hyperball_harmonic`'s HLL ball sizes (NF estimated, not
    enumerated), which is the 100 TB path.
    """
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    nf = neighborhood_function(spark, edges, max_t, directed=directed)
    from pyspark.sql import Window as W

    total = nf.agg(F.max("nf").alias("n_pairs"))
    wl = W.orderBy("t")
    rows = (
        nf.crossJoin(F.broadcast(total))
        .select(
            "t",
            "nf",
            "n_pairs",
            F.lag("nf").over(wl).alias("__prev"),
        )
        .filter(F.col("nf").cast("double") >= F.lit(q) * F.col("n_pairs"))
        .orderBy("t")
        .limit(1)
    )
    # mean distance: sum over t >= 1 of t * (NF(t) - NF(t-1)), i.e. the
    # per-distance pair counts recovered from the cumulative deltas
    mean_d = (
        nf.select(
            "t", (F.col("nf") - F.coalesce(F.lag("nf").over(wl), F.lit(0))).alias("__c")
        )
        .filter(F.col("t") >= 1)
        .agg(
            (
                F.sum(F.col("t").cast("long") * F.col("__c"))
                / F.sum("__c")
            ).alias("__m")
        )
    )
    return rows.crossJoin(F.broadcast(mean_d)).select(
        "n_pairs",
        F.col("t").alias("d_q"),
        F.round(
            F.when(
                F.col("t") == 0, F.lit(0.0)
            ).otherwise(
                F.col("t")
                - 1
                + (F.lit(q) * F.col("n_pairs") - F.col("__prev"))
                / (F.col("nf") - F.col("__prev"))
            ),
            6,
        ).alias("d_q_interp"),
        F.round(F.col("__m"), 6).alias("mean_dist"),
    )


def harmonic_centrality(
    spark, edges: DataFrame, max_t: int, *, directed: bool = False
) -> DataFrame:
    """DF[id, harmonic] — truncated harmonic centrality
    H_T(v) = Σ_{0 < d(v,u) <= T} 1/d(v,u). Exact tier. On digraphs the
    standard convention counts u that can REACH v (incoming paths);
    undirected (default) both coincide."""
    pairs = distance_pairs(spark, edges, max_t, directed=directed)
    tgt = "u" if directed else "v"
    return (
        pairs.filter(F.col("dist") > 0)
        .groupBy(F.col(tgt).alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"))
    )


# ---------------------------------------------------------------------------
# HyperBall (scale tier)
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _init_registers(verts: DataFrame, p: int) -> DataFrame:
    """One-element HLL per vertex: register idx(v) holds rho(v), the
    rest 0. idx = top p bits of xxhash64(id); rho = 1 + leading zeros
    of the remaining 64-p bits (capped so it fits a tinyint)."""
    m = 1 << p
    h = F.xxhash64("id")
    # unsigned top p bits
    idx = F.shiftrightunsigned(h, 64 - p)
    rest = F.shiftleft(h, p)  # remaining bits, left-aligned in a long
    # rho = leading zeros of `rest` + 1. bin() renders a positive long
    # without leading zeros (length == bit_length); negative == MSB set
    # == zero leading zeros; rest == 0 means the max run (64 - p bits,
    # the low p positions of `rest` are shifted-in zeros by design).
    rho = (
        F.when(rest < 0, F.lit(1))
        .when(rest == 0, F.lit(64 - p + 1))
        .otherwise(F.lit(64) - F.length(F.bin(rest)) + F.lit(1))
    ).cast("tinyint")
    cols = [F.col("id")]
    for j in range(m):
        cols.append(
            F.when(idx == j, rho).otherwise(F.lit(0).cast("tinyint")).alias(f"r{j}")
        )
    return verts.select(*cols)


def _estimate_expr(m: int):
    """HLL cardinality estimate over register columns r0..r{m-1}, with
    the standard small-range (linear counting) correction."""
    inv_sum = None
    zeros = None
    for j in range(m):
        term = F.pow(F.lit(2.0), -F.col(f"r{j}").cast("double"))
        z = F.when(F.col(f"r{j}") == 0, 1).otherwise(0)
        inv_sum = term if inv_sum is None else inv_sum + term
        zeros = z if zeros is None else zeros + z
    raw = F.lit(_hll_alpha(m) * m * m) / inv_sum
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0), linear
    ).otherwise(raw)


def hyperball_harmonic(
    spark,
    edges: DataFrame,
    *,
    p: int = 6,
    max_t: int = 64,
    directed: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, ExecutionInfo]:
    """Approximate truncated harmonic centrality (and final ball
    estimate) for every vertex via HyperBall.

    Returns (DF[id, harmonic, ball_est], info). ``harmonic`` ≈
    Σ_t (|B(v,t)| - |B(v,t-1)|)/t accumulated from the per-step HLL
    estimates; relative error ~ 1.04/sqrt(2^p) per ball estimate
    (p=6 → ~13%). On digraphs the ball grows along INCOMING edges so
    ``harmonic`` counts vertices that reach v — the centrality
    convention (see :func:`harmonic_centrality`).

    Scale shape per superstep: signals = edges ⋈ state (hash join on
    the vertex id), groupBy(dst) with m independent max() aggregates —
    map-side combine collapses the shuffle to one row per (partition,
    dst) — then a co-partitioned left join + per-column greatest().
    State is m+3 columns; lineage is cut every step (localCheckpoint,
    the engine-wide pattern, superstep.py). Convergence: sum of all
    registers is monotone; unchanged sum == fixpoint (exact).
    """
    m = 1 << p
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if directed:
        # reverse edges: ball collects vertices that REACH v
        e = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).filter(F.col("src") != F.col("dst")).distinct()
    else:
        e = _undirect(edges)
    e = e.repartition(P, "src").persist()
    e.count()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    rcols = [f"r{j}" for j in range(m)]
    est = _estimate_expr(m)
    state = (
        _init_registers(verts, p)
        .withColumn("est", est)
        .withColumn("harmonic", F.lit(0.0))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    info = ExecutionInfo()
    t0 = _time.monotonic()

    def _regsum(s: DataFrame) -> int:
        return s.select(
            F.sum(sum(F.col(c).cast("long") for c in rcols))
        ).first()[0]

    prev_sum = _regsum(state)
    for t in range(1, max_t + 1):
        ts = _time.monotonic()
        sig = e.join(state, e["src"] == state["id"], "inner").select(
            F.col("dst").alias("id"), *rcols
        )
        agg = sig.groupBy("id").agg(*[F.max(c).alias(c) for c in rcols])
        nxt = (
            state.alias("s")
            .join(agg.alias("a"), "id", "left")
            .select(
                F.col("id"),
                *[
                    F.greatest(F.col(f"s.{c}"), F.coalesce(F.col(f"a.{c}"), F.lit(0)))
                    .cast("tinyint")
                    .alias(c)
                    for c in rcols
                ],
                F.col("s.est").alias("est_prev"),
                F.col("s.harmonic").alias("harmonic"),
            )
        )
        nxt = nxt.withColumn("est_new", est).select(
            "id",
            *rcols,
            F.col("est_new").alias("est"),
            (
                F.col("harmonic")
                + F.greatest(F.col("est_new") - F.col("est_prev"), F.lit(0.0))
                / F.lit(float(t))
            ).alias("harmonic"),
        )
        nxt = nxt.repartition(P, "id").localCheckpoint(eager=True)
        cur_sum = _regsum(nxt)
        info.supersteps = t
        info.per_step.append(
            {
                "t": t,
                "register_sum": cur_sum,
                "wall_ms": (_time.monotonic() - ts) * 1000.0,
            }
        )
        state = nxt
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    e.unpersist()
    info.wall_seconds = _time.monotonic() - t0
    out = state.select("id", "harmonic", F.col("est").alias("ball_est"))
    return out, info
