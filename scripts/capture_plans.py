"""Capture .explain("formatted") for declared queries → plans/<tag>/.

Usage: python scripts/capture_plans.py <repo_root> <out_dir> <query> [...]

Runs each ``queries()`` entry of <repo_root>'s __spark_entry__.py against
sf0.001 and writes the formatted physical plan (lazy — no execution,
so AQE shows the initial plan; Exchange count / join strategy / scan
pushdown are all visible).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    repo, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    sys.path.insert(0, repo)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(repo, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from signal_collect_spark.session import get_spark

    spark = get_spark(app_name="capture_plans", master="local[8]", shuffle_partitions=8)
    os.makedirs(out_dir, exist_ok=True)

    # Neutralize midstream materialization so the WHOLE dataflow is
    # visible in one explain (otherwise an internal eager localCheckpoint
    # collapses everything upstream into a "Scan ExistingRDD" leaf).
    # Only safe for non-iterative queries — iterative loops are captured
    # per-iteration by capture_iter_plans.py instead.
    # CAPTURE_NO_PATCH=1 keeps eager checkpoints live — the right mode
    # for operators whose optimization IS a midstream materialization
    # (the checkpoint leaf plus the deduplicated subtree is the honest
    # after-plan there).
    if not os.environ.get("CAPTURE_NO_PATCH"):
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:
            from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore[assignment]
    qs = m.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not a declared query", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"OK   {name}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
