"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same configuration keys are what a
spark-submit --py-files deployment on a multi-executor cluster would
set (AQE on, sensible shuffle partitioning, Arrow transfers).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "signal_collect_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is orthogonal to deployment mode.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # match parallelism in local mode; a cluster would use 2-3x total cores
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else max(int(n), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner periodic GC every 120s (re-measured this round;
        # an earlier 90s A/B under the old engine was ~11% slower, but
        # per-step lineage truncation multiplied the checkpoint blocks
        # whose cleanup waits on a JVM GC, and a 24g heap GCs too rarely
        # on its own). Full-bench ABAB, 3-repeat medians: 120s arms
        # 114.4/120.5s vs default arms 121.0/123.3s — every GC run beat
        # every default run, and the per-query repeat spread collapses
        # toward the per-query minima (connected_components 4.9-7.4 ->
        # 4.8-5.9, label_propagation 3.8-6.2 -> 3.9-5.0): the cleaner's
        # weak-ref bookkeeping is what degraded repeats 2-3. Env hook
        # kept for hosts where forced GC pauses cost more.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "120s"),
        )
        # Always use the sort-based (serialized/Unsafe) shuffle writer.
        # Below this threshold Spark's bypass-merge writer opens one file
        # PER REDUCE PARTITION per map task; at small partition counts
        # that is the at-scale code path's opposite, and the event log
        # showed it costing 26ms MEAN Shuffle Write Time per task on
        # ~80KB writes. ABBA A/B across 4 JVMs (100-superstep PageRank,
        # 2 runs each): default-200 = 42.3-51.3s, threshold-2 =
        # 30.5-37.1s (-31%), bit-identical checksums. At production
        # partition counts (> 200) the default disables bypass anyway,
        # so this only aligns small-P local runs with the scale path.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("SPARK_GRAFT_BYPASS_THRESHOLD", "2"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``signal_collect_spark`` importable on executor Python
    workers regardless of the driver's cwd.

    UDF closures (multimodal codecs, CSR kernels) unpickle by module
    name on the workers; when the driver runs outside the repo and the
    job wasn't spark-submitted with ``--py-files``, that import fails.
    Shipping the package archive via ``addPyFile`` — the same artifact
    a cluster deployment passes to spark-submit — closes the gap. Uses
    the prebuilt ``dist/signal_collect_spark.zip`` when present AND at
    least as new as every package source file (a stale zip would make
    executors import old module code while the driver runs current
    code — silent UDF divergence, ADVICE r3); otherwise zips the
    package source to a temp file once per session."""
    if getattr(spark, "_scs_pyfiles_added", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(os.path.dirname(pkg_dir), "dist", "signal_collect_spark.zip")
    if os.path.exists(zip_path):
        zip_mtime = os.path.getmtime(zip_path)
        stale = any(
            fn.endswith(".py") and os.path.getmtime(os.path.join(root, fn)) > zip_mtime
            for root, _dirs, files in os.walk(pkg_dir)
            for fn in files
        )
    else:
        stale = True
    if stale:
        import tempfile
        import zipfile

        fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="scs_pyfiles_")
        os.close(fd)
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._scs_pyfiles_added = True
