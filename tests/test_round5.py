"""Round-5 fixes (ADVICE r4 + VERDICT r4 nits).

- prefix_jaccard: epsilon-guarded ceiling keeps the prefix-filter
  no-false-negative guarantee when threshold*n is an integer whose
  double product rounds a hair above it.
- wl_colors: a vertex whose only incident edges are self-loops still
  gets a color row (every-vertex convention, matching the oracle).
- MIS / matching: info.converged is honest on truncated runs.
- hamiltonian_paths: the too-many-vertices guard fires from a bounded
  limit() probe, not a full vertex-set collect.
- butterfly_count: pure long arithmetic (no double sum rounding).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_collect_spark.algorithms.butterflies import butterfly_count
from signal_collect_spark.algorithms.hamiltonian import hamiltonian_paths
from signal_collect_spark.algorithms.matching import maximal_matching
from signal_collect_spark.algorithms.mis import maximal_independent_set
from signal_collect_spark.algorithms.wl import wl_colors
from signal_collect_spark.data.setjoin import prefix_jaccard_pairs


def test_prefix_jaccard_integer_threshold_no_false_negative(spark):
    # t=0.55, |B|=100: 0.55*100 = 55.00000000000001 in doubles, so a
    # bare ceil() gives 56 and shortens B's prefix from 46 to 45 —
    # exactly enough to miss the qualifying subset pair below, because
    # B's 45 unique tokens (df=1) sort ahead of every shared token.
    shared = [f"s{i:03d}" for i in range(55)]
    uniq = [f"u{i:03d}" for i in range(45)]
    docs = spark.createDataFrame(
        [(1, " ".join(shared)), (2, " ".join(uniq + shared))],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(docs, 0.55).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] == pytest.approx(0.55)


def test_wl_self_loop_only_vertex_gets_color(spark):
    # vertex 9's only incidence is a self-loop: it must still be
    # colored (as an isolated vertex), and must NOT share the color of
    # the degree-1 path vertices.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 9)], "src long, dst long"
    )
    out, _ = wl_colors(spark, edges, rounds=2, num_partitions=4)
    colors = {r["id"]: r["color"] for r in out.collect()}
    assert set(colors) == {1, 2, 3, 9}
    assert colors[9] != colors[1]  # isolated vs degree-1
    assert colors[1] == colors[3]  # path ends agree


def _path_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )


def test_mis_truncated_run_reports_not_converged(spark):
    edges = _path_edges(spark, 40)
    out, info = maximal_independent_set(spark, edges, rounds=1)
    undecided = out.filter(F.col("status") == "undecided").count()
    assert undecided > 0
    assert info.converged is False
    assert info.stop_reason == "max_steps"
    # and a full run still reports converged honestly
    out2, info2 = maximal_independent_set(spark, edges, rounds=12)
    assert out2.filter(F.col("status") == "undecided").count() == 0
    assert info2.converged is True
    assert info2.stop_reason == "converged"


def test_matching_truncated_run_reports_not_converged(spark):
    edges = _path_edges(spark, 40)
    out, info = maximal_matching(spark, edges, rounds=1)
    assert out.filter(~F.col("matched")).count() > 0
    assert info.converged is False
    assert info.stop_reason == "max_steps"


def test_hamiltonian_guard_raises_from_bounded_probe(spark):
    edges = _path_edges(spark, 100)  # 101 vertices >> max_vertices=5
    with pytest.raises(ValueError, match="more than 5 vertices"):
        hamiltonian_paths(spark, edges, max_vertices=5)


def test_butterfly_count_long_schema_and_exact(spark):
    # K_{2,3}: groups {1,2} x items {10,20,30} -> 3 co-occurring item
    # pairs each with weight 2 -> 3 butterflies, 6 wedge incidences.
    edges = spark.createDataFrame(
        [(g, i) for g in (1, 2) for i in (10, 20, 30)],
        "src long, dst long",
    )
    row = butterfly_count(edges).collect()[0]
    assert row["n_butterflies"] == 3
    assert row["n_wedges"] == 6
    schema = {f.name: f.dataType.simpleString() for f in butterfly_count(edges).schema}
    assert schema["n_butterflies"] == "bigint"
