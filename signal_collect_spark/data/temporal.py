"""Temporal joins over event tables — the as-of join.

Beyond-reference data-pipeline operator: the reference's streaming
surface (edge logs, windows, sessions — streaming.py here) covers
aligned-time aggregation, but training-data and analytics pipelines
constantly need the MISALIGNED-time primitive: attach to each event
the latest earlier record of another stream (last model version before
a sample was scored, last page view before a purchase, last config
change before an error). That is the as-of join (kdb+'s ``aj``,
pandas ``merge_asof``, DuckDB ``ASOF JOIN``).

Spark has no built-in as-of join. The naive formulations both fail at
scale: a range join (``l.ts >= r.ts``) is O(n·m) per key without a
range-join optimizer, and a windowed subquery per left row shuffles
twice. This implementation uses the union-sort trick — tag both
sides, union, ONE window sorted by (key, ts, side) carrying the last
non-null right payload forward — so the whole join costs exactly one
shuffle + sort per key partition, the same cost as a session window,
and inherits AQE skew handling on hot keys.

Determinism: right rows at identical (key, ts) are ordered by their
payload struct, so "the" latest right row is well-defined and the
operator is a pure function of its inputs (the DuckDB oracle in
`__spark_entry__.py` dedupes equal timestamps the same way before its
native ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | list[str] = "user_id",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row of the
    same ``by`` key with ``right.on <= left.on`` (ties included).

    Returns all ``left`` columns plus ``{prefix}{on}`` (the matched
    right timestamp) and ``{prefix}{c}`` for each of ``value_cols``
    (default: every right column except ``on``/``by``) — NULL when no
    right row precedes the left row (or none within
    ``tolerance_seconds``, when given).

    Multiple right rows at the exact same (key, timestamp) resolve to
    the one with the greatest (value_cols...) tuple — a pinned,
    engine-independent tie rule.
    """
    keys = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in keys]
    lcols = left.columns
    payload = F.struct(
        F.col(on).alias("__ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in lcols) + ">"
        ).alias("__l"),
    )
    lp = F.struct(*[F.col(c).alias(c) for c in lcols])
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType.simpleString()).alias("__r"),
        lp.alias("__l"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "__side", "__l", F.last("__r", ignorenulls=True).over(w).alias("__m")
    )
    out = carried.filter(F.col("__side") == 1)
    cols = [F.col(f"__l.{c}").alias(c) for c in lcols]
    m = F.col("__m")
    if tolerance_seconds is not None:
        stale = (
            F.col(f"__l.{on}").cast("double") - m["__ts"].cast("double")
        ) > F.lit(float(tolerance_seconds))
        m = F.when(m.isNotNull() & ~stale, F.col("__m"))
    cols.append(m["__ts"].alias(f"{prefix}{on}"))
    cols.extend(m[c].alias(f"{prefix}{c}") for c in value_cols)
    return out.select(*cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Bucketed interval-containment join: each point row matched to
    every interval with ``start <= ts < end`` (half-open, the event-
    time convention everywhere else in this package).

    Spark's native answer to a containment predicate is a broadcast
    nested-loop / cartesian range join — O(|points|·|intervals|), dead
    at any real scale. The standard scalable shape (also what DuckDB's
    iejoin and Flink's interval join do internally, and the same trick
    `data/similarity.py` uses for LSH buckets) is temporal BUCKETING:
    explode each interval onto the fixed-width time buckets it covers,
    bucket each point once, hash-equi-join on bucket, then re-check
    the exact predicate. Cost: ONE shuffle keyed on bucket; the
    explode factor is span/bucket_width per interval, bounded by
    ``max_buckets_per_interval`` with a loud pre-join guard (bounded
    limit(1) probe, never a full materialization — the
    hamiltonian/similarity guard pattern).

    Timestamps/bounds must be integers (epoch micros recommended —
    exact in both engines); ``bucket_width`` trades shuffle key
    cardinality against explode factor: ~ the median interval span is
    a good default.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")

    def ibucket(c):
        # exact floor-division for integer columns: subtracting the
        # positive pmod makes the numerator an exact multiple of the
        # width, so the double division is error-free even at 2^53-
        # scale epoch-micro timestamps (a raw floor(c/w) can land one
        # bucket off exactly at boundaries)
        c = F.col(c) if isinstance(c, str) else c
        return ((c - F.pmod(c, F.lit(bucket_width))) / bucket_width).cast("long")

    nb = ibucket(F.col(end_col) - 1) - ibucket(start_col) + 1
    # reversed/empty intervals (end <= start) make nb <= 0, slipping
    # past the span cap while F.sequence would generate a DESCENDING
    # bucket list — a badly reversed interval explodes unboundedly
    # before the exact re-check can drop it (r5 ADVICE). Reject both
    # degenerate shapes in the same bounded probe.
    probe = (
        intervals.filter(
            (F.col(end_col) <= F.col(start_col)) | (nb > max_buckets_per_interval)
        )
        .limit(1)
        .collect()
    )
    if probe:
        r = probe[0]
        raise ValueError(
            f"interval [{r[start_col]}, {r[end_col]}) is empty/reversed or "
            f"spans more than max_buckets_per_interval="
            f"{max_buckets_per_interval} buckets of width {bucket_width}; "
            "fix the interval bounds or raise bucket_width/the cap"
        )
    b_iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(ibucket(start_col), ibucket(F.col(end_col) - 1))
        ),
    )
    b_pt = points.withColumn("_bucket", ibucket(point_ts))
    return (
        b_pt.join(b_iv, "_bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )
