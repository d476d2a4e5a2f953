"""The north rule's deployment path: the engine must run via
``spark-submit --py-files dist/signal_collect_spark.zip``. This test
actually spark-submits (subprocess, cwd OUTSIDE the repo so the
package can only be imported through the shipped zip) and checks the
star5 golden ranks from the output parquet."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_pagerank(spark, tmp_path):
    from signal_collect_spark import fixtures

    edges_dir = str(tmp_path / "edges")
    out_dir = str(tmp_path / "ranks")
    fixtures.edges_df(spark, fixtures.star5()).write.parquet(edges_dir)

    # ship the CURRENT sources, not a possibly stale committed zip
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "build_pyfiles.py")],
        check=True, capture_output=True, cwd=REPO,
    )
    res = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--py-files", os.path.join(REPO, "dist", "signal_collect_spark.zip"),
            os.path.join(REPO, "scripts", "submit_job.py"),
            "pagerank", "--edges", edges_dir, "--output", out_dir, "--tol", "1e-3",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 5 and summary["converged"]

    ranks = {
        r["id"]: r["rank"] for r in spark.read.parquet(out_dir).collect()
    }
    assert abs(ranks[4] - 0.66) < 0.01
    for i in range(4):
        assert abs(ranks[i] - 0.15) < 0.01
