"""Deterministic test fixtures.

A. Golden graphs lifted from the reference's integration tests
   (IntegrationSpec.scala:110-295, ComputationTerminationSpec.scala:44-97,
   ChineseWhispersClustering.scala:60-94, ClusteringCoefficient.scala:49-78)
   with analytically-known outputs — see FIXTURES.md.

B. A synthetic source-code table matching BASELINE.json's input_hint
   (repo, path, commit, lang, content) — seed 42, Zipf-skewed import
   targets so a few hub files have very high in-degree, ~1% dangling
   references, duplicate (repo, path) rows at different commits.
   Generated locally — NO external data.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

from signal_collect_spark.graph import edges_from_pairs

# ---------------------------------------------------------------------------
# A. golden graphs (edge lists; weight 1.0)
# ---------------------------------------------------------------------------


def cycle(n: int) -> list[tuple[int, int]]:
    """0→1→…→n-1→0 (IntegrationSpec cycle generator)."""
    return [(i, (i + 1) % n) for i in range(n)]


def star5() -> list[tuple[int, int]]:
    """Leaves 0..3 each point at center 4 (IntegrationSpec.scala:124-136)."""
    return [(i, 4) for i in range(4)]


def star5_symmetric() -> list[tuple[int, int]]:
    """Symmetric star for SSSP (IntegrationSpec.scala:210-222)."""
    return [(i, 4) for i in range(4)] + [(4, i) for i in range(4)]


def grid(width: int, height: int | None = None) -> list[tuple[int, int]]:
    """width×height grid, ids 1..n, both directions — exact port of the
    Grid generator at IntegrationSpec.scala:238-253 (e.g. Grid(2,2) ⇒
    (1,3),(3,1),(1,2),(2,1),(2,4),(4,2),(3,4),(4,3))."""
    height = height or width
    n = width * height
    edges = []
    for v in range(1, n + 1):
        if v + width <= n:
            edges.append((v, v + width))
            edges.append((v + width, v))
        if v % height != 0:
            edges.append((v, v + 1))
            edges.append((v + 1, v))
    return edges


def torus(width: int) -> list[tuple[int, int]]:
    """width×width torus, 4 wrap-around neighbours, both directions
    (generator at IntegrationSpec.scala:255-295; ids 0..n-1)."""
    edges = []
    for s in range(width * width):
        r, c = divmod(s, width)
        for rr, cc in (
            ((r - 1) % width, c),
            ((r + 1) % width, c),
            (r, (c - 1) % width),
            (r, (c + 1) % width),
        ):
            edges.append((s, rr * width + cc))
    return edges


def sssp_cycle4() -> list[tuple[int, int]]:
    return [(0, 1), (1, 2), (2, 3), (3, 0)]


def cw_clusters() -> list[tuple[int, int]]:
    """Two triads {0,1,2} and {8,9,10} joined by a chain 2-3-4-5-6-7-8,
    all edges symmetric (ChineseWhispersClustering.scala:60-94 shape)."""
    und = [(0, 1), (0, 2), (1, 2), (8, 9), (8, 10), (9, 10)]
    und += [(i, i + 1) for i in range(2, 8)]
    return und + [(b, a) for a, b in und]


def cc_components() -> list[tuple[int, int]]:
    """cycle5 ⊎ star5(+100) ⊎ isolated-ish singletons {200,201,202}
    (self-loop edges so the vertices exist in the edge table)."""
    e = cycle(5)
    e += [(a + 100, b + 100) for a, b in star5()]
    e += [(i, i) for i in (200, 201, 202)]
    return e


def tri6() -> list[tuple[int, int]]:
    """6-vertex clustering-coefficient example graph
    (ClusteringCoefficient.scala:49-78): triangles 1-2-3, 1-3-5, 1-5-6."""
    und = [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (2, 3), (3, 5), (5, 6)]
    return und + [(b, a) for a, b in und]


def edges_df(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    return edges_from_pairs(spark, pairs)


# ---------------------------------------------------------------------------
# B. synthetic source-code table (input_hint schema)
# ---------------------------------------------------------------------------

LANGS = ("python", "c", "scala")

_IMPORT_TMPL = {
    "python": "import pkg_{i}.mod_{j}",
    "c": '#include "pkg_{i}/mod_{j}.h"',
    "scala": "import pkg_{i}.mod_{j}",
}
_EXT = {"python": "py", "c": "h", "scala": "scala"}

_FILLER = (
    "def main():",
    "    return compute(x)",
    "// core routine",
    "val graph = build()",
    "static int counter = 0;",
    "# signal collect superstep",
)


def _commit_for(repo: str, path: str, gen: int = 0) -> str:
    return hashlib.sha1(f"{repo}:{path}:{gen}".encode()).hexdigest()


def make_source_files(
    spark: SparkSession,
    n_repos: int = 8,
    files_per_repo: int = 40,
    refs_per_file: int = 4,
    seed: int = 42,
    zipf_s: float = 1.2,
    dangling_frac: float = 0.01,
    dup_frac: float = 0.05,
) -> DataFrame:
    """Deterministic source table (repo, path, commit, lang, content).

    Every repo has files pkg_{i}/mod_{j}; each file's content embeds
    refs_per_file import/include statements whose targets follow a
    Zipf(s) distribution over file indices (index 0 = the hub).
    ~dangling_frac of references point at non-existent modules;
    ~dup_frac of files get a second row at a different commit with
    different content (the engine must keep the lexicographically
    greatest commit — deterministic "latest").
    """
    rng = random.Random(seed)
    n_files = n_repos * files_per_repo

    # Zipf-ish pmf over file index within a repo
    weights = [1.0 / ((k + 1) ** zipf_s) for k in range(files_per_repo)]
    total = sum(weights)
    weights = [w / total for w in weights]

    rows = []
    for r in range(n_repos):
        repo = f"org/repo-{r:04d}"
        lang = LANGS[r % len(LANGS)]
        for f in range(files_per_repo):
            i, j = divmod(f, 10)
            path = f"src/pkg_{i}/mod_{j}.{_EXT[lang]}"
            lines = [f"// file {repo}/{path}" if lang != "python" else f"# file {repo}/{path}"]
            for _ in range(refs_per_file):
                if rng.random() < dangling_frac:
                    ti, tj = 999, rng.randrange(100)  # non-existent pkg
                else:
                    t = rng.choices(range(files_per_repo), weights=weights)[0]
                    ti, tj = divmod(t, 10)
                lines.append(_IMPORT_TMPL[lang].format(i=ti, j=tj))
            lines.extend(rng.sample(_FILLER, 3))
            content = "\n".join(lines)
            rows.append((repo, path, _commit_for(repo, path, 0), lang, content))
            if rng.random() < dup_frac:
                # older duplicate at a different commit, different content
                rows.append(
                    (
                        repo,
                        path,
                        _commit_for(repo, path, 1),
                        lang,
                        content + "\n# stale revision",
                    )
                )
    assert len(rows) >= n_files
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
