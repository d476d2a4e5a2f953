"""Durable superstep checkpoints with per-partition lineage + metrics.

≙ the reference's snapshot/restore: every worker serializes its vertex
store to ``$workerId.snapshot`` and restore re-adds every vertex
(WorkerImplementation.scala:457-510, Graph.scala:211-228, verified by
features/SnapshotSpec.scala:32-67).

Spark-native version (strictly stronger — durable and exactly
resumable mid-computation):
  * every k supersteps the state DataFrame is written to
    ``<dir>/superstep=<n>/state`` (parquet, partitioned write) and
    re-read, which also truncates the iterative plan's lineage;
  * a ``lineage`` parquet is written alongside with one row per state
    partition: (superstep, partition_id, rows, sum_state, wall_ms) —
    the per-partition lineage + metrics the north rule requires;
  * ``restore()`` finds the newest complete checkpoint (atomicity via
    parquet's _SUCCESS marker plus a DONE marker written after the
    lineage) and resumes from its superstep.

At 100 TB scale this is a plain parquet/Iceberg table write — no
driver-side collection; the lineage aggregate is one narrow groupBy
over spark_partition_id().
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "superstep int, partition_id int, rows long, sum_state double, wall_ms double"


class CheckpointManager:
    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _step_dir(self, superstep: int) -> str:
        return os.path.join(self.dir, f"superstep={superstep:06d}")

    def save(self, state: DataFrame, superstep: int) -> DataFrame:
        """Write state + lineage; return the re-read (lineage-truncated) state."""
        t0 = time.monotonic()
        d = self._step_dir(superstep)
        # invalidate any previous checkpoint of this superstep BEFORE
        # overwriting: a crash mid-overwrite must not leave a stale DONE
        # marker pointing at a partially rewritten state (ADVICE r1) —
        # DONE is only ever present for a fully written checkpoint
        done = os.path.join(d, "DONE")
        if os.path.exists(done):
            os.remove(done)
        state_path = os.path.join(d, "state")
        state.write.mode("overwrite").parquet(state_path)
        reread = self.spark.read.parquet(state_path)
        wall_ms = (time.monotonic() - t0) * 1000.0
        state_col = "state" if "state" in reread.columns else reread.columns[1]
        lineage = (
            reread.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col(state_col).cast("double")).alias("sum_state"),
            )
            .select(
                F.lit(superstep).alias("superstep"),
                "partition_id",
                "rows",
                "sum_state",
                F.lit(wall_ms).alias("wall_ms"),
            )
        )
        lineage.write.mode("overwrite").parquet(os.path.join(d, "lineage"))
        # completion marker: restore only trusts checkpoints that got here
        with open(os.path.join(d, "DONE"), "w") as fh:
            fh.write(str(superstep))
        return reread

    def latest_superstep(self) -> int | None:
        steps = []
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if name.startswith("superstep=") and os.path.exists(
                os.path.join(self.dir, name, "DONE")
            ):
                steps.append(int(name.split("=")[1]))
        return max(steps) if steps else None

    def restore(self) -> tuple[DataFrame, int] | None:
        """Newest complete checkpoint as (state DF, superstep), or None."""
        last = self.latest_superstep()
        if last is None:
            return None
        state = self.spark.read.parquet(os.path.join(self._step_dir(last), "state"))
        return state, last

    def lineage(self) -> DataFrame:
        """All lineage rows across checkpoints (superstep, partition_id, rows, sum_state, wall_ms)."""
        paths = [
            os.path.join(self.dir, name, "lineage")
            for name in sorted(os.listdir(self.dir))
            if name.startswith("superstep=")
            and os.path.exists(os.path.join(self.dir, name, "DONE"))
        ]
        return self.spark.read.parquet(*paths)
