"""Engine-level behavior: checkpoint/resume, lineage metrics, aggregation
surface plumbing (≙ features/SnapshotSpec.scala:32-67, GraphResetSpec)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from signal_collect_spark import fixtures as FX
from signal_collect_spark.algorithms.pagerank import pagerank
from signal_collect_spark.checkpoint import CheckpointManager


def test_checkpoint_writes_state_and_lineage(spark, tmp_ckpt):
    edges = FX.edges_df(spark, FX.torus(5))
    state, info = pagerank(
        spark,
        edges,
        max_steps=6,
        converge_tol=0.0,
        num_partitions=4,
        checkpoint_dir=tmp_ckpt,
        checkpoint_every=3,
    )
    mgr = CheckpointManager(spark, tmp_ckpt)
    assert mgr.latest_superstep() == 6
    lin = mgr.lineage()
    assert set(lin.columns) == {"superstep", "partition_id", "rows", "sum_state", "wall_ms"}
    per_step = {
        r["superstep"]: (r["rows"], r["sum_state"])
        for r in lin.groupBy("superstep")
        .agg(F.sum("rows").alias("rows"), F.sum("sum_state").alias("sum_state"))
        .collect()
    }
    assert set(per_step) == {3, 6}
    assert all(rows == 25 for rows, _ in per_step.values())


def test_resume_mid_computation_is_exact(spark, tmp_ckpt):
    """Run 12 supersteps straight vs 6 + resume-from-checkpoint + 6:
    identical per-vertex state (the north rule's exact-resume gate)."""
    edges = FX.edges_df(spark, FX.torus(5))
    kw = dict(converge_tol=0.0, num_partitions=4, check_every=1)

    straight, _ = pagerank(spark, edges, max_steps=12, **kw)
    straight_ranks = {r["id"]: r["rank"] for r in straight.collect()}

    pagerank(spark, edges, max_steps=6, checkpoint_dir=tmp_ckpt, checkpoint_every=3, **kw)
    # simulate a new job resuming from the durable checkpoint
    resumed, info = pagerank(
        spark,
        edges,
        max_steps=12,
        checkpoint_dir=tmp_ckpt,
        checkpoint_every=3,
        resume=True,
        **kw,
    )
    resumed_ranks = {r["id"]: r["rank"] for r in resumed.collect()}
    assert info.supersteps == 12
    assert resumed_ranks.keys() == straight_ranks.keys()
    for v in straight_ranks:
        # same superstep arithmetic; 1e-12 absorbs shuffle-fetch-order
        # float-sum reassociation (partial aggregates combine in
        # nondeterministic fetch order), 6 orders below the 1e-6 gate
        assert resumed_ranks[v] == pytest.approx(straight_ranks[v], abs=1e-12), v


def test_resume_ignores_incomplete_checkpoint(spark, tmp_ckpt):
    edges = FX.edges_df(spark, FX.cycle(5))
    pagerank(
        spark, edges, max_steps=4, converge_tol=0.0, num_partitions=4,
        checkpoint_dir=tmp_ckpt, checkpoint_every=2,
    )
    mgr = CheckpointManager(spark, tmp_ckpt)
    assert mgr.latest_superstep() == 4
    # corrupt the newest checkpoint: remove its DONE marker
    os.remove(os.path.join(tmp_ckpt, "superstep=000004", "DONE"))
    assert mgr.latest_superstep() == 2


def test_max_steps_bounds_execution(spark):
    # ≙ ExecutionConfiguration stepsLimit (DefaultGraph.scala:311)
    edges = FX.edges_df(spark, FX.cycle(5))
    _, info = pagerank(spark, edges, max_steps=3, converge_tol=0.0, num_partitions=4)
    assert info.supersteps == 3
    assert not info.converged
