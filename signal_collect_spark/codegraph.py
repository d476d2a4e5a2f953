"""Source-code table → link graph (the engine's ingest pipeline).

Input (BASELINE.json input_hint): a table of source-code repositories
  (repo string, path string, commit string, lang string, content string)
— at production scale an Iceberg catalog of 10^12 files; here parquet/
in-memory with identical code paths.

Pipeline (all distributed, no driver-side loops):
  1. ``latest_files``  — duplicate (repo, path) rows at different commits
     keep the lexicographically greatest commit (deterministic "latest";
     ≙ ExistingVertexHandler merge on duplicate addVertex,
     WorkerImplementation.scala:299-318 / interfaces/Handlers.scala:26-37).
  2. ``build_nodes``   — node_id = xxhash64(repo, path); carries
     content_sha256 so the per-row content invariant is checkable
     end-to-end (BASELINE.json: "per-row content sha256 equality").
  3. ``extract_references`` — import/include targets per lang. Default
     path is JVM-side ``regexp_extract_all`` (whole-stage codegen, no
     Python in the loop); ``mode="pandas"`` is the vectorized
     Arrow/pandas-UDF equivalent (str.extractall on Arrow batches —
     never per-row Python), tested equal.
  4. ``build_edges``   — resolve references within the repo by joining
     on (repo, module stem); unresolved (~dangling) references drop out
     of the inner join (≙ undeliverable-signal handler default,
     interfaces/Handlers.scala:39-50).

Scale notes:
  * node_id via xxhash64 needs no global sort / window — at 10^12 nodes
    a 64-bit space has birthday-collision risk ≈ 2.7%; production would
    widen to a 128-bit (two-column) key — the engine only requires ids
    to be hashable and unique.
  * reference extraction is a map-only stage (pushdown-friendly: only
    repo, path, lang, content are read); resolution is one shuffle join
    on (repo, stem), naturally partition-pruned per repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one pattern per language family; group 1 = pkg, group 2 = mod
REF_PATTERNS = {
    "python": r"import (pkg_\d+)\.(mod_\d+)",
    "scala": r"import (pkg_\d+)\.(mod_\d+)",
    "c": r'#include "(pkg_\d+)/(mod_\d+)\.h"',
}


def latest_files(source: DataFrame) -> DataFrame:
    """One row per (repo, path): the greatest commit wins, content rides along."""
    picked = source.groupBy("repo", "path").agg(
        F.max(F.struct("commit", "lang", "content")).alias("top")
    )
    return picked.select(
        "repo", "path", "top.commit", "top.lang", "top.content"
    )


def node_id_col(repo_col, path_col):
    return F.xxhash64(repo_col, F.lit("\x00"), path_col)


def build_nodes(files: DataFrame) -> DataFrame:
    """nodes: (node_id, repo, path, commit, lang, content_sha256, stem)."""
    return files.select(
        node_id_col(F.col("repo"), F.col("path")).alias("node_id"),
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.regexp_replace(F.col("path"), r"\.[^.]+$", "").alias("stem"),
    )


def extract_references(files: DataFrame, mode: str = "jvm") -> DataFrame:
    """(repo, path, target_stem) — one row per reference statement.

    mode="jvm": built-in regexp_extract_all (codegen'd, the fast path).
    mode="pandas": Arrow-batched pandas UDF (str.extractall) — the
    vectorized-UDF formulation; no per-row Python either way.
    """
    if mode == "jvm":
        out = None
        for lang, pat in REF_PATTERNS.items():
            part = files.filter(F.col("lang") == lang).select(
                "repo",
                "path",
                F.explode(
                    F.regexp_extract_all("content", F.lit(pat), 0)
                ).alias("ref"),
            )
            pkg = F.regexp_extract("ref", pat, 1)
            mod = F.regexp_extract("ref", pat, 2)
            part = part.select(
                "repo",
                "path",
                F.concat(F.lit("src/"), pkg, F.lit("/"), mod).alias("target_stem"),
            )
            out = part if out is None else out.unionAll(part)
        return out

    if mode == "pandas":
        import pandas as pd  # noqa: PLC0415

        schema = T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("target_stem", T.StringType()),
            ]
        )

        def _extract(batches):
            for pdf in batches:
                frames = []
                for lang, pat in REF_PATTERNS.items():
                    sub = pdf[pdf["lang"] == lang]
                    if sub.empty:
                        continue
                    hits = sub["content"].str.extractall(pat)
                    if hits.empty:
                        continue
                    idx = hits.index.get_level_values(0)
                    frames.append(
                        pd.DataFrame(
                            {
                                "repo": sub["repo"].loc[idx].to_numpy(),
                                "path": sub["path"].loc[idx].to_numpy(),
                                "target_stem": (
                                    "src/" + hits[0] + "/" + hits[1]
                                ).to_numpy(),
                            }
                        )
                    )
                yield (
                    pd.concat(frames)
                    if frames
                    else pd.DataFrame({"repo": [], "path": [], "target_stem": []})
                )

        return files.select("repo", "path", "lang", "content").mapInPandas(
            _extract, schema
        )

    raise ValueError(f"unknown mode {mode!r}")


def build_edges(nodes: DataFrame, refs: DataFrame) -> DataFrame:
    """edges (src, dst, weight=1.0): references resolved within the repo
    by (repo, stem) join; dangling targets drop out (inner join)."""
    src = refs.select(
        node_id_col(F.col("repo"), F.col("path")).alias("src"),
        "repo",
        "target_stem",
    )
    tgt = nodes.select(
        F.col("node_id").alias("dst"), F.col("repo").alias("t_repo"), "stem"
    )
    return (
        src.join(
            tgt,
            (src["repo"] == tgt["t_repo"]) & (src["target_stem"] == tgt["stem"]),
        )
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )


def code_link_graph(source: DataFrame, ref_mode: str = "jvm") -> tuple[DataFrame, DataFrame]:
    """source table → (nodes, edges). The end-to-end ingest used by
    bench and tests; content bytes are never transformed (sha256
    invariant holds by construction and is asserted in tests)."""
    files = latest_files(source)
    nodes = build_nodes(files)
    refs = extract_references(files, mode=ref_mode)
    edges = build_edges(nodes, refs)
    return nodes, edges


def verify_content_sha256(source: DataFrame, nodes: DataFrame) -> int:
    """Rows whose content_sha256 disagrees with a fresh hash of the source
    table (must be 0). Checks the kept-commit rows end-to-end."""
    src_hash = source.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("h")
    )
    joined = nodes.join(src_hash, ["repo", "path", "commit"], "inner")
    return joined.filter(F.col("content_sha256") != F.col("h")).count()


def package_graph(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Contract the file-level code link graph to the package level —
    the web page-graph → host-graph rollup, applied to code: one row
    per (src_package, dst_package) with the number of underlying
    file-to-file references. Package = the path's directory part
    (``src/pkg_i`` in the fixture layout), qualified by repo so two
    repos' identically-named packages stay distinct vertices.

    Built on :func:`signal_collect_spark.graph.contract_graph`; see its
    docstring for the two-join + map-side-combine scale shape.
    """
    from signal_collect_spark.graph import contract_graph

    mapping = nodes.select(
        F.col("node_id").alias("id"),
        F.concat(
            F.col("repo"),
            F.lit("::"),
            F.regexp_replace(F.col("path"), r"/[^/]+$", ""),
        ).alias("group"),
    )
    return contract_graph(edges, mapping)
