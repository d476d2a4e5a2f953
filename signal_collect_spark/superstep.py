"""The engine: bounded synchronous supersteps over DataFrames.

Reproduces Signal/Collect's synchronous execution loop
(DefaultGraph.scala:297-343): signalStep → barrier → collectStep,
repeated until convergence or a steps/time limit
(ExecutionConfiguration.scala:86-97, enforced DefaultGraph.scala:311,340-342).

Mapping (SURVEY.md §2.1/§3):
  * signalStep (WorkerImplementation.scala:285-291)
      = ``frontier ⋈ edges`` producing a signal per out-edge
        (DefaultEdge.scala:70-72); frontier = rows with
        ``residual > signal_threshold`` — the reference's score-guided
        scheduling, strict > (WorkerImplementation.scala:213-215).
  * message combining / bulk messaging (IntIdDoubleSignalMessageBus.scala:31-56,
    BulkMessageBus.scala:84-145)
      = Catalyst's partial (map-side) HashAggregate in ``groupBy(dst).agg``.
  * collectStep (WorkerImplementation.scala:293-297)
      = left join of state with the aggregated inbox + the kernel's
        collect expressions (DataGraphVertex.scala:84-87 /
        DataFlowVertex.scala:51-54).
  * convergence = aggregated residual check, mirroring the per-vertex
    ``scoreSignal > θ`` gate plus GlobalTerminationDetection
    (ExecutionConfiguration.scala:156-159).
  * snapshot/restore (WorkerImplementation.scala:457-510, Graph.scala:211-228)
      = parquet checkpoints every k supersteps with per-partition
        lineage + metrics; exact resume (checkpoint.py).

Two physical modes, identical semantics (tests assert equality):
  * mode="sql"  — pure DataFrame ops: JVM-side, whole-stage codegen,
    partial aggregation; the default and the fast path.
  * mode="csr"  — CSR-packed edge partitions + vectorized numpy
    gather-scatter inside ``cogroup().applyInPandas`` (the north star's
    "SpMV-style pass ... over CSR-packed edge partitions"). Useful when
    the per-edge kernel is not expressible as a column expression.

Scale design (1000-executor / 10^9-edge):
  * edges are partitioned ONCE by src and persisted; every superstep's
    signal join reuses that partitioning — per-iteration shuffle is only
    the inbox aggregate (combined map-side first).
  * state is persisted per superstep and lineage is truncated every
    ``truncate_every`` steps (localCheckpoint) or durably every
    ``checkpoint_every`` (parquet) — without this, iterative plans grow
    superlinearly.
  * one driver action per superstep computes (max residual, frontier
    size, Σ state) in a single aggregate — the convergence barrier.
    Spark's job boundary IS the BSP barrier; no idle-detection protocol
    (DefaultCoordinator.scala:255-304) is needed.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from signal_collect_spark import graph as G
from signal_collect_spark.checkpoint import CheckpointManager


@dataclass
class Kernel:
    """A vertex-centric algorithm spec — the Spark analogue of the
    reference's user-supplied Vertex/Edge subclasses (its UDF surface,
    SURVEY.md §2.5: collect DataGraphVertex.scala:57, signal
    DefaultEdge.scala:56, scoreSignal Vertex.scala:101-109).

    The signal a frontier vertex sends along an edge is
    ``combine(value(vertex), edge.weight)`` and the inbox is the
    ``agg`` of all signals addressed to one target — this scalar
    (value, combine, agg) form covers every sum/min-monoid algorithm
    (PageRank, SSSP, CC, company valuation, ...). Non-scalar
    algorithms (label propagation) drive :func:`run_supersteps` with
    custom_messages instead.
    """

    name: str
    #: init(vertices DF[id]) -> state DF with at least (id, residual) columns
    init: Callable[[DataFrame], DataFrame]
    #: column expression over state columns: the scalar a frontier vertex emits
    value: Callable[[], Column]
    #: how the emitted value combines with edge weight: "mul" | "add" | "value"
    edge_combine: str = "mul"
    #: inbox aggregation: "sum" | "min" | "max" | "set" | "count" — or a
    #: list of (alias, kind) when collect needs several views of the
    #: inbox (e.g. Schelling needs sum AND count). Single scalar kinds
    #: only for mode="csr".
    agg: str | list[tuple[str, str]] = "sum"
    #: collect(state-with-inbox DF) -> new state DF (inbox column: `inbox`,
    #: NULL where no signals arrived; `was_frontier` boolean column provided)
    collect: Callable[[DataFrame], DataFrame] = None  # type: ignore[assignment]
    #: which edge weight column feeds `combine` ("weight" or "norm_weight")
    weight_col: str = "weight"
    state_cols: list[str] = field(default_factory=list)
    #: dtype of the emitted value: "double" (default) or "long".
    #: "long" keeps integer-labeled algorithms (min-label CC) EXACT for
    #: full-range 64-bit ids — a double would silently lose precision
    #: above 2^53. "long" requires edge_combine="value" (no weight math).
    value_dtype: str = "double"
    #: declare that every emitted value is a VERTEX ID (e.g. min-label
    #: CC propagates ids). When the engine's int32 byte diet is active
    #: (all ids fit int32), such values ride the signal shuffle as int32
    #: too — the id bound proves the value bound. Leave False for
    #: kernels whose long values are not ids (counts, packed states).
    value_is_id: bool = False


@dataclass
class ExecutionInfo:
    """≙ ExecutionInformation (ExecutionInformation.scala:42-79)."""

    supersteps: int = 0
    converged: bool = False
    wall_seconds: float = 0.0
    edges_signaled: int = 0
    per_step: list[dict] = field(default_factory=list)
    #: why the loop stopped: "converged" | "max_steps" | "time_limit"
    stop_reason: str = "max_steps"
    #: persisted DataFrames the run left cached (the final state);
    #: callers that are done with the result free executor memory via
    #: :meth:`release` — algorithm wrappers return *derived* DataFrames,
    #: so unpersisting those would be a no-op (ADVICE r1).
    caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for df in self.caches:
            df.unpersist()
        self.caches.clear()


def _combine_expr(kind, value_col: str, weight_col: str) -> Column:
    # a callable is the general user-defined Edge.signal surface
    # (DefaultEdge.scala:56 lets the edge compute ANY function of
    # source state + edge payload): (value Column, weight Column) ->
    # signal Column. SQL mode only — the CSR fast path dispatches on
    # the named monoid kinds.
    if callable(kind):
        return kind(F.col(value_col), F.col(weight_col))
    if kind == "mul":
        return F.col(value_col) * F.col(weight_col)
    if kind == "add":
        return F.col(value_col) + F.col(weight_col)
    if kind == "value":
        return F.col(value_col)
    raise ValueError(f"unknown edge_combine {kind!r}")


_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "set": F.collect_set,
    "count": F.count,
}


def _agg_spec(kernel: "Kernel") -> list[tuple[str, str]]:
    return [("inbox", kernel.agg)] if isinstance(kernel.agg, str) else list(kernel.agg)


class _loop_aqe_off:
    """Scoped AQE disable for plan-pinned iterative loops.

    The loop pins everything AQE would decide at runtime — partition
    counts (explicit repartition + 'auto' data-size rule), join strategy
    (shuffle_hash hints), skew (hub salting) — so AQE's contribution per
    superstep is pure overhead: one driver-blocking job per query stage,
    a replan + plan-description event per stage completion. With lineage
    truncated every 2 steps (shallow plans), same-JVM interleaved A/B on
    the 100-superstep bench PageRank, 2 reps: AQE on = 41.6/32.5s, AQE
    off = 30.1/29.0s (-20%), bit-identical checksums. (With DEEP plans
    the ranking flips hard — AQE-off at interval 4 was 88.8/88.7s — so
    this scoping is only safe together with the truncation clamp above.)
    Scoped + restored so non-loop queries keep AQE's runtime replanning
    (broadcast conversion, coalescing, skew splits) everywhere else.
    """

    def __init__(self, spark):
        self._conf = spark.conf
        self._prev = None

    def __enter__(self):
        import os

        if os.environ.get("SPARK_GRAFT_LOOP_AQE", "") != "on":
            self._prev = self._conf.get("spark.sql.adaptive.enabled", "true")
            self._conf.set("spark.sql.adaptive.enabled", "false")
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            self._conf.set("spark.sql.adaptive.enabled", self._prev)
        return False


def loop_aqe_off(fn):
    """Decorator form of :class:`_loop_aqe_off` for the non-engine
    iterative operators (salsa/MIS/push-PPR/WL/star-CC/...): their
    driver loops pin partitioning and truncate lineage per round, so
    AQE's per-stage jobs are pure per-round overhead. Interleaved
    same-JVM A/B at sf0.1, AQE on -> off, outputs identical: salsa
    7.6/8.0 -> 6.8/7.8s, mis 5.9/6.2 -> 5.6/5.3s, ppr_push 19.9/18.1
    -> 14.4/14.9s, wl_colors 4.9/4.6 -> 3.2/2.7s. First argument must
    be the SparkSession (all loop operators follow that convention)."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark, *a, **k):
        with _loop_aqe_off(spark):
            return fn(spark, *a, **k)

    return wrapper


def run_supersteps(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    kernel: Kernel,
    **opts,
) -> tuple[DataFrame, ExecutionInfo]:
    """Public entry: the superstep loop under scoped AQE-off (see
    :class:`_loop_aqe_off`); all options forwarded to the impl, whose
    docstring below is the full contract."""
    with _loop_aqe_off(spark):
        return _run_supersteps_impl(spark, edges, vertices, kernel, **opts)


def _run_supersteps_impl(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    kernel: Kernel,
    *,
    signal_threshold: float = 0.0,
    converge_tol: float = 1e-9,
    max_steps: int = 100,
    time_limit: float | None = None,
    mode: str = "sql",
    csr_salts: int = 1,
    hub_threshold: int | None = 500_000,
    num_partitions: int | str | None = None,
    edges_per_partition: int = 1_000_000,
    compact_ids: bool | str = "auto",
    truncate_every: int = 4,
    check_every: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    checkpoint_tag: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, ExecutionInfo]:
    """Run the bounded synchronous superstep loop to convergence.

    Returns (final state DataFrame, ExecutionInfo). The frontier gate is
    strict ``residual > signal_threshold`` exactly like the reference
    (WorkerImplementation.scala:213); global stop is
    ``max(residual) <= converge_tol`` — the aggregated-residual
    re-expression of per-vertex score thresholds.

    ``time_limit`` (seconds, wall clock) ≙ ExecutionConfiguration's
    timeLimit (ExecutionConfiguration.scala:86-97, enforced between
    supersteps like DefaultGraph.scala:340-342): checked at every
    convergence barrier; the loop stops with stop_reason="time_limit".

    ``hub_threshold`` wires out-degree skew handling into the DEFAULT
    sql engine: sources with out-degree above it get their adjacency
    split across ceil(deg/hub_threshold) salt buckets (capped at P), so
    no single task owns a mega-hub's whole fan-out. The frontier is
    replicated only for hub vertices (a broadcast join against the tiny
    hub list); sum/min inbox aggregation is associative so results are
    bit-identical (tests assert equality). None disables.

    ``num_partitions`` sizes every shuffle in the loop. ``None`` uses the
    session's shuffle partitions; an int pins it; ``"auto"`` sizes from
    the data — ``max(defaultParallelism, ceil(|E| / edges_per_partition))``
    (one extra count scan) — so a 10^12-edge graph gets ~10^6 partitions
    without anyone retuning a static cluster-wide setting, while small
    graphs keep every core busy. The floor matters: a measured P=1 run on
    a 0.6M-edge sf0.1 graph was 1.5× slower than P=8/P=32 (which tie) —
    per-superstep cost on small graphs is fixed stage overhead, not task
    count, so shrinking P below the core count only serializes the real
    work without removing any overhead.

    ``compact_ids`` is the SURVEY §7 byte diet on the persisted edge
    cache the signal join re-reads EVERY superstep (the loop is
    measured memory-bandwidth-bound once cores saturate a socket, so
    cached bytes/edge is the per-superstep cost driver at fixed |E|):

      * the cache is pruned to exactly (src, dst[, weight_col]) — the
        raw ``weight`` column is dropped for kernels normalized onto
        ``norm_weight`` (PageRank), and ALL weight columns are dropped
        for ``edge_combine="value"`` kernels (CC) whose signal never
        reads one;
      * ``"auto"`` (default) downcasts src/dst to int32 STORAGE when
        one setup aggregate proves every id fits; ``True`` skips the
        scan (caller guarantees the bound), ``False`` disables. The
        scan is shared with ``num_partitions="auto"``, so enabling both
        costs ONE extra pass over the edge columns.
      * a kernel with ``value_is_id`` (min-label CC) additionally rides
        its signal VALUES as int32 — the inbox shuffle payload halves.

    The diet narrows STORAGE, never JOIN KEYS: the loop's one-exchange-
    per-superstep shape depends on the frontier inheriting state's
    hash(id: long) partitioning and on the inbox aggregate landing
    co-partitioned with state, so the int cache is hash-partitioned on
    the WIDENED key ``cast(src as long)`` — exactly the cast Catalyst
    inserts into the mixed-type signal join, keeping the edge side
    exchange-free — and ``dst`` is widened back to long BEFORE the
    inbox groupBy so the aggregate's output partitioning matches the
    state join. (The first cut of this cast the frontier id down
    instead; that broke both co-partitionings and cost 1.5-2.9× wall —
    measured, hence this shape.)

    Cached bytes/edge: PageRank 32 → 16, CC 24 → 8. The widened casts
    hash the same long values, so partition assignment — and with it
    float aggregation grouping — matches the undieted run; integer
    kernels are exact, float kernels are tested to 1e-9 against the
    undieted plan.
    """
    # Lineage is truncated EVERY superstep regardless of the caller's
    # truncate_every: the barrier action's cost is dominated by the size
    # of the plan/RDD graph it renders, analyzes and ships in every task
    # binary, and that size grows ~2x per untruncated superstep (state
    # feeds both the frontier and the collect join). Measured ladder on
    # the 100-superstep bench PageRank: interval 5 = 57.2/51.1s,
    # interval 2 = 38.5/44.8s (same-JVM interleaved A/B, AQE on); after
    # the loop went AQE-off (see _loop_aqe_off) the per-step checkpoint
    # compile got cheap enough that interval 1 wins the ABAB across
    # fresh JVMs: 24.3/24.3s vs 29.0/33.7s for interval 2 (-18%), and
    # connected_components 4.4/3.9 vs 4.6/5.7, temporal_bfs 4.5/4.8 vs
    # 5.3/5.8. Results are bit-identical (same sum_rank checksum). The
    # event log pins the mechanism: 45ms MEAN task-deserialize time and
    # 3/4 driver jstack samples inside TreeNode.generateTreeString with
    # deep plans; per-step truncation also removes the odd-step persist
    # entirely (a checkpointed state IS materialized storage).
    import os as _os
    _t_env = _os.environ.get("SPARK_GRAFT_TRUNC")  # measurement escape hatch
    truncate_every = int(_t_env) if _t_env else 1
    spec = _agg_spec(kernel)
    if kernel.value_dtype == "long" and kernel.edge_combine != "value":
        raise ValueError("value_dtype='long' requires edge_combine='value' (no weight math)")
    need_w = kernel.edge_combine != "value"
    wcols = [kernel.weight_col] if need_w else []
    e_in = edges.select("src", "dst", *wcols) if mode == "sql" else edges
    scan = None
    if num_partitions == "auto" or (mode == "sql" and compact_ids == "auto"):
        scan = e_in.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.greatest("src", "dst")).alias("mx"),
            F.min(F.least("src", "dst")).alias("mn"),
        ).first()
    if num_partitions == "auto":
        floor = spark.sparkContext.defaultParallelism
        P = max(floor, min(200_000, -(-scan["n"] // edges_per_partition)))
    else:
        P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    use32 = mode == "sql" and (
        compact_ids is True
        or (
            compact_ids == "auto"
            and scan["mx"] is not None
            and scan["mx"] < 2**31
            and scan["mn"] >= -(2**31)
        )
    )
    if use32:
        e_in = e_in.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
            *wcols,
        )
    compact_value = use32 and kernel.value_is_id
    # partition the (possibly int-stored) cache on the WIDENED key so it
    # canonically matches the cast Catalyst adds to the long-vs-int
    # signal join — storage narrows, join keys and partitioning don't
    src_key = F.col("src").cast("long") if use32 else F.col("src")
    info = ExecutionInfo()
    t0 = time.monotonic()

    csr = None
    hub_salts = None
    if mode == "csr":
        if len(spec) != 1 or spec[0][1] not in ("sum", "min", "max"):
            raise ValueError("mode='csr' supports a single sum/min/max aggregate")
        if callable(kernel.edge_combine):
            raise ValueError(
                "mode='csr' supports only the named combine kinds "
                "(mul/add/value); a callable edge_combine is SQL-mode only"
            )
        if csr_salts > P:
            # salts congruent mod P would duplicate frontier replicas in
            # one pid and double-count edge contributions (ADVICE r1)
            raise ValueError(f"csr_salts={csr_salts} must be <= num_partitions={P}")
        edges_p = G.partition_edges(edges, P).persist()
        csr = G.csr_pack(
            edges_p, P, weight_col=kernel.weight_col, n_salts=csr_salts
        ).persist()
        csr.count()
    elif hub_threshold is not None:
        # one-time skew scan: hubs = sources whose fan-out exceeds the
        # per-task edge budget; tiny by construction (≤ |E|/threshold)
        hub_salts = (
            e_in.groupBy("src")
            .agg(F.count("*").alias("__deg"))
            .filter(F.col("__deg") > F.lit(hub_threshold))
            .select(
                "src",
                F.least(
                    F.ceil(F.col("__deg") / F.lit(hub_threshold)), F.lit(P)
                ).cast("int").alias("__n_salt"),
            )
            # __n_salt == 1 is only reachable via the P cap (deg > threshold
            # already forces ceil >= 2); a 1-salt "hub" must NOT be treated
            # as salted: its replica branch would explode sequence(1, 0) —
            # which Spark evaluates DESCENDING to [1, 0] — adding a
            # duplicate salt-0 frontier row that double-counts every hub
            # edge (ADVICE r2). Salting is a no-op at P=1 anyway.
            .filter(F.col("__n_salt") >= 2)
            .persist()
        )
        if hub_salts.count() == 0:
            hub_salts.unpersist()
            hub_salts = None
            edges_p = e_in.repartition(P, src_key).persist()
        else:
            # the salted superstep plan (union + broadcast join) grows
            # Catalyst/cache-lookup cost SUPERLINEARLY with lineage
            # depth — measured 6s -> 97s per step by step 4 untruncated;
            # flat at 6s with truncation every 1-2 steps
            truncate_every = min(truncate_every, 2)
            e = e_in.join(F.broadcast(hub_salts), "src", "left")
            edges_p = e.withColumn(
                "__salt",
                F.when(
                    F.col("__n_salt").isNotNull(),
                    F.pmod(F.xxhash64("dst"), F.col("__n_salt").cast("long")).cast("int"),
                ).otherwise(F.lit(0)),
            ).drop("__n_salt").repartition(P, src_key, "__salt").persist()
    else:
        edges_p = e_in.repartition(P, src_key).persist()

    ckpt = (
        CheckpointManager(spark, checkpoint_dir, tag=checkpoint_tag)
        if checkpoint_dir
        else None
    )
    start_step = 0
    state = None
    if resume and ckpt is not None:
        restored = ckpt.restore()
        if restored is not None:
            state, start_step = restored
    if state is None:
        state = kernel.init(vertices).repartition(P, "id")
    state = state.persist()

    agg_fn = _AGGS[spec[0][1]]
    pending: list[DataFrame] = []
    # barrier pipelining (see the barrier block below): off when durable
    # checkpointing is active — ckpt.save() runs its own write jobs
    # in-line and resume bookkeeping assumes strictly ordered barriers
    if ckpt is None:
        from concurrent.futures import ThreadPoolExecutor

        barrier_pool = ThreadPoolExecutor(max_workers=1)
    else:
        barrier_pool = None
    inflight = None
    # the frontier id stays LONG — it must inherit state's hash(id)
    # partitioning untouched for the exchange-free signal join; only the
    # PAYLOAD narrows (value_is_id kernels emit int32 values)
    fval = (
        kernel.value().cast("int").alias("value")
        if compact_value
        else kernel.value().alias("value")
    )
    # inbox target widened back to long BEFORE the aggregate, so the agg
    # output lands hash-partitioned on a long key and the state/inbox
    # join needs no further exchange
    dst_out = F.col("e.dst").cast("long").alias("dst") if use32 else F.col("e.dst").alias("dst")

    for step in range(start_step, max_steps):
        ts = time.monotonic()
        frontier = state.filter(F.col("residual") > F.lit(signal_threshold)).select(
            F.col("id"), fval
        )

        if mode == "csr":
            inbox = _csr_signal(frontier, csr, P, kernel, agg_fn, csr_salts)
        else:
            # SHUFFLE_HASH on the frontier (build) side: a sort-merge join
            # would re-sort the edge table every superstep — measured 1.6x
            # slower at 19M edges; the frontier hash table is bounded by
            # |state|/P per partition
            if hub_salts is not None:
                # replicate ONLY hub frontier rows across their salt
                # sub-partitions; the main frontier path takes a constant
                # __salt=0 column — NO generator. (An explode over a
                # 1-element array for every non-hub row would knock the
                # whole frontier scan out of whole-stage codegen:
                # measured 1.7x slower.) Hub replicas (salts 1..n-1)
                # come from a broadcast semi-join against the tiny hub
                # list and are unioned in — a few rows per superstep.
                replicas = frontier.join(
                    F.broadcast(hub_salts),
                    frontier["id"] == hub_salts["src"],
                ).select(
                    "id",
                    "value",
                    F.explode(
                        F.sequence(F.lit(1), F.col("__n_salt") - 1)
                    ).alias("__salt"),
                )
                frontier = frontier.withColumn("__salt", F.lit(0)).unionAll(replicas)
                f, e = frontier.hint("shuffle_hash").alias("f"), edges_p.alias("e")
                cond = (F.col("f.id") == F.col("e.src")) & (
                    F.col("f.__salt") == F.col("e.__salt")
                )
            else:
                f, e = frontier.hint("shuffle_hash").alias("f"), edges_p.alias("e")
                # under the diet the cast is written EXPLICITLY so the
                # join key is the same expression the cache was
                # partitioned on (an implicitly-coerced cast may not
                # canonicalize equal → spurious re-exchange)
                e_src = F.col("e.src").cast("long") if use32 else F.col("e.src")
                cond = F.col("f.id") == e_src
            sig = f.join(e, cond).select(
                dst_out,
                _combine_expr(kernel.edge_combine, "f.value", f"e.{kernel.weight_col}").alias("m"),
            )
            # groupBy(dst) = message combining: Catalyst plans a partial
            # (map-side) HashAggregate before the shuffle — the analogue of
            # IntIdDoubleSignalMessageBus's per-target combining.
            inbox = sig.groupBy("dst").agg(
                *[_AGGS[kind]("m").alias(alias) for alias, kind in spec]
            )

        inbox = inbox.select(
            F.col("dst").alias("__inbox_id"), *[alias for alias, _ in spec]
        )
        joined = state.alias("s").join(
            inbox.hint("shuffle_hash").alias("i"),
            F.col("s.id") == F.col("i.__inbox_id"),
            "left",
        ).drop("__inbox_id")
        joined = joined.withColumn(
            "was_frontier", F.col("residual") > F.lit(signal_threshold)
        )
        # the state/inbox join is co-partitioned with state's hash
        # partitioning on id, so new_state keeps it — no repartition here
        # (a forced exchange per superstep would double the shuffle volume)
        new_state = kernel.collect(joined)

        durable = ckpt is not None and (step + 1) % checkpoint_every == 0
        checking = durable or (step + 1) % check_every == 0 or step + 1 == max_steps
        truncated = False
        if durable:
            new_state = ckpt.save(new_state, superstep=step + 1)
        elif (step + 1) % truncate_every == 0:
            # SERIALIZED block storage: the deserialized default stores
            # raw rows through DeserializedValuesHolder, whose
            # SizeTracker re-walks the stored object graph with
            # SizeEstimator reflection on every growth sample — jstack
            # sampling showed it dominating task time on small per-step
            # states. Serialized blocks track exact byte counts instead.
            new_state = new_state.localCheckpoint(
                eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
            truncated = True
        # every superstep's state is persisted: each is referenced twice
        # by the next superstep (frontier + collect join) — without a
        # cache the lazily-chained plan recomputes it exponentially.
        # A just-checkpointed state needs NO extra cache: its blocks ARE
        # materialized storage, so persisting it again would store every
        # 4th state twice (checkpoint blocks + InMemoryRelation batches).
        if not truncated:
            new_state = new_state.persist()
        pending.append(state)
        state = new_state
        if not checking:
            # chain supersteps lazily; the convergence barrier (a Spark
            # action) is amortized over check_every supersteps
            info.supersteps = step + 1
            continue

        # single action per barrier: convergence + metrics. With
        # barrier_pool set (no durable checkpointing in play), the
        # action runs on a worker thread while THIS thread keeps
        # compiling the next block of supersteps — profiling split the
        # loop ~10.6s barrier execution vs ~9s driver-side Catalyst
        # compile at sf0.1 with the executors idle during compile, so
        # pipelining hides one under the other (guide §2.6: actions are
        # only sequential because the driver calls them sequentially).
        # Pipeline depth is 1 block: the previous barrier must resolve
        # before the next is submitted, so convergence/time-limit
        # decisions see exactly the same states in the same order as
        # the synchronous loop; on stop, the speculatively COMPILED
        # (never executed) block is discarded and the barrier's own
        # state is returned — results identical.
        bar = state.agg(
            F.max("residual").alias("max_res"),
            F.sum((F.col("residual") > F.lit(signal_threshold)).cast("long")).alias(
                "frontier"
            ),
            F.count("*").alias("n"),
        )
        if barrier_pool is None:
            m = bar.first()
            stop, bstate = _process_barrier(
                info, m, step + 1, state, pending, ts, durable,
                signal_threshold=signal_threshold, converge_tol=converge_tol,
                time_limit=time_limit, t0=t0,
            )
            pending = []
            if stop:
                break
        else:
            if inflight is not None:
                fut, bstep, bstate0, bpending, bts, bdur = inflight
                inflight = None
                m = fut.result()
                stop, bstate = _process_barrier(
                    info, m, bstep, bstate0, bpending, bts, bdur,
                    signal_threshold=signal_threshold, converge_tol=converge_tol,
                    time_limit=time_limit, t0=t0,
                )
                if stop:
                    state = bstate
                    # the speculative block appended bstate (and its
                    # successors) to pending; the final cleanup must not
                    # unpersist the state we are RETURNING
                    pending = [df for df in pending if df is not bstate]
                    break
            snapshot, pending = pending, []
            inflight = (
                barrier_pool.submit(bar.first), step + 1, state, snapshot, ts, durable,
            )

    if inflight is not None:
        fut, bstep, bstate0, bpending, bts, bdur = inflight
        m = fut.result()
        stop, bstate = _process_barrier(
            info, m, bstep, bstate0, bpending, bts, bdur,
            signal_threshold=signal_threshold, converge_tol=converge_tol,
            time_limit=time_limit, t0=t0,
        )
        if stop:
            state = bstate
    if barrier_pool is not None:
        barrier_pool.shutdown(wait=True)
    for df in pending:
        df.unpersist()
    pending.clear()
    edges_p.unpersist()
    if csr is not None:
        csr.unpersist()
    if hub_salts is not None:
        hub_salts.unpersist()
    info.wall_seconds = time.monotonic() - t0
    info.caches.append(state)
    return state, info


def _process_barrier(
    info: ExecutionInfo,
    m,
    bstep: int,
    bstate: DataFrame,
    bpending: list,
    ts: float,
    durable: bool,
    *,
    signal_threshold: float,
    converge_tol: float,
    time_limit: float | None,
    t0: float,
) -> tuple[bool, DataFrame]:
    """Record one resolved convergence barrier; returns (stop, barrier
    state). Factored out so the synchronous and pipelined paths share
    the exact decision logic (same inputs → same stop/metrics)."""
    for df in bpending:
        df.unpersist()
    bpending.clear()
    info.per_step.append(
        {
            "superstep": bstep,
            "max_residual": m["max_res"],
            "frontier_size": m["frontier"],
            "vertices": m["n"],
            "wall_ms": (time.monotonic() - ts) * 1000.0,
            "checkpointed": durable,
        }
    )
    if m["max_res"] is None or m["max_res"] <= converge_tol:
        info.supersteps = bstep
        info.converged = True
        info.stop_reason = "converged"
        return True, bstate
    if time_limit is not None and time.monotonic() - t0 >= time_limit:
        info.supersteps = bstep
        info.stop_reason = "time_limit"
        return True, bstate
    info.supersteps = max(info.supersteps, bstep)
    return False, bstate


def recalculate_scores(state: DataFrame, kernel: Kernel) -> DataFrame:
    """≙ Graph.recalculateScores (Graph.scala:155-166 / WorkerApi
    recalculateScoresForVertexWithId): recompute every vertex's
    residual from its CURRENT state without delivering any signals —
    one collect pass over an empty inbox. Useful after out-of-band
    state edits (mutation.reset, manual state patches) to re-arm the
    frontier gate."""
    spec = _agg_spec(kernel)
    vdt = "bigint" if kernel.value_dtype == "long" else "double"
    kind_type = {"set": f"array<{vdt}>", "count": "bigint"}
    j = state
    for alias, kind in spec:
        j = j.withColumn(alias, F.lit(None).cast(kind_type.get(kind, vdt)))
    j = j.withColumn("was_frontier", F.lit(False))
    return kernel.collect(j)


def _csr_signal(
    frontier: DataFrame, csr: DataFrame, P: int, kernel: Kernel, agg_fn, n_salts: int = 1
):
    """One signal step through the CSR/numpy path.

    cogroup(frontier by pid, csr by pid) → vectorized gather-scatter:
    searchsorted locates each frontier vertex's adjacency slice; the
    per-edge combine and the partition-local pre-aggregation are pure
    numpy (the partition-local aggregate mirrors the reference's bulk
    bus combining); the final cross-partition aggregate is one small
    shuffle on dst.

    A pid's CSR may arrive as SEVERAL bounded-size chunk rows
    (graph.csr_pack chunks at ``max_chunk_edges`` so Arrow rows stay far
    from the 2 GiB batch limit at 10^9 edges); chunks partition the
    sorted src range, so each is gathered independently and the partials
    are combined locally before the cross-partition shuffle.
    """
    combine = kernel.edge_combine
    # normalized spec — kernel.agg may be the list form of a single
    # aggregate; reading it raw would mis-dispatch the combine (ADVICE r1)
    out_alias, agg_kind = _agg_spec(kernel)[0]
    np_val = "int64" if kernel.value_dtype == "long" else "float64"
    out_type = "long" if kernel.value_dtype == "long" else "double"

    def _spmv(left, right):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        vdt = np.dtype(np_val)
        empty = pd.DataFrame({"dst": np.empty(0, np.int64), "m": np.empty(0, vdt)})
        if len(left) == 0 or len(right) == 0:
            return empty
        fid_all = left["id"].to_numpy(dtype=np.int64)
        fval_all = left["value"].to_numpy(dtype=vdt)
        parts_t, parts_m = [], []
        for _, chunk in right.iterrows():
            srcs = np.asarray(chunk["srcs"], dtype=np.int64)
            dsts = np.asarray(chunk["dsts"], dtype=np.int64)
            wts = np.asarray(chunk["weights"], dtype=np.float64)
            lo = np.searchsorted(srcs, fid_all, side="left")
            hi = np.searchsorted(srcs, fid_all, side="right")
            counts = hi - lo
            keep = counts > 0
            lo, counts, fval = lo[keep], counts[keep], fval_all[keep]
            if len(lo) == 0:
                continue
            # gather: flat index vector covering every out-edge of the frontier
            idx = np.repeat(lo, counts) + (
                np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
            )
            val = np.repeat(fval, counts)
            if combine == "mul":
                m = val * wts[idx]
            elif combine == "add":
                m = val + wts[idx]
            else:
                m = val
            parts_t.append(dsts[idx])
            parts_m.append(m)
        if not parts_t:
            return empty
        tgt = np.concatenate(parts_t)
        m = np.concatenate(parts_m).astype(vdt, copy=False)
        # partition-local combine (≙ bulk-bus per-target aggregation)
        uniq, inv = np.unique(tgt, return_inverse=True)
        if agg_kind == "sum":
            out = np.zeros(len(uniq), vdt)
            np.add.at(out, inv, m)
        elif agg_kind == "min":
            fill = np.iinfo(np.int64).max if vdt.kind == "i" else np.inf
            out = np.full(len(uniq), fill, dtype=vdt)
            np.minimum.at(out, inv, m)
        else:
            fill = np.iinfo(np.int64).min if vdt.kind == "i" else -np.inf
            out = np.full(len(uniq), fill, dtype=vdt)
            np.maximum.at(out, inv, m)
        return pd.DataFrame({"dst": uniq, "m": out})

    if n_salts > 1:
        # replicate each frontier vertex to every salt sub-partition its
        # (hub) adjacency may have been spread across
        f = frontier.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        ).withColumn("pid", G.frontier_pid(F.col("id"), P, salt_col=F.col("__salt"))).drop("__salt")
    else:
        f = frontier.withColumn("pid", G.frontier_pid(F.col("id"), P))
    partial = (
        f.groupBy("pid")
        .cogroup(csr.groupBy("pid"))
        .applyInPandas(_spmv, f"dst long, m {out_type}")
    )
    return partial.groupBy("dst").agg(agg_fn("m").alias(out_alias))
