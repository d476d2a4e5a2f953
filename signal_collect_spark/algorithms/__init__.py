"""Built-in graph algorithms — the reference's example/conformance
surface (SURVEY.md §2.2) re-expressed on the superstep engine."""

from signal_collect_spark.algorithms.pagerank import pagerank
from signal_collect_spark.algorithms.components import connected_components
from signal_collect_spark.algorithms.sssp import sssp
from signal_collect_spark.algorithms.labelprop import label_propagation
from signal_collect_spark.algorithms.triangles import triangle_count, local_clustering_coefficient
from signal_collect_spark.algorithms.examples import (
    company_valuation,
    game_of_life,
    schelling_segregation,
    vertex_coloring,
)
from signal_collect_spark.algorithms.hamiltonian import hamiltonian_paths
from signal_collect_spark.algorithms.hits import hits
from signal_collect_spark.algorithms.salsa import salsa
from signal_collect_spark.algorithms.katz import katz
from signal_collect_spark.algorithms.matching import maximal_matching
from signal_collect_spark.algorithms.mis import maximal_independent_set
from signal_collect_spark.algorithms.modularity import modularity
from signal_collect_spark.algorithms.kcore import core_number, k_core
from signal_collect_spark.algorithms.sudoku import SUDOKU1, SUDOKU2, sudoku
from signal_collect_spark.algorithms.crawler import crawl, crawl_pagerank, extract_links
from signal_collect_spark.algorithms.ppr import ppr_push
from signal_collect_spark.algorithms.scc import strongly_connected_components
from signal_collect_spark.algorithms.walks import random_walks
from signal_collect_spark.algorithms.pathquery import (
    QueryNode,
    fixed,
    path_query,
    path_query_strings,
    star,
    wildcard,
)

__all__ = [
    "QueryNode",
    "fixed",
    "path_query",
    "path_query_strings",
    "star",
    "wildcard",
    "pagerank",
    "connected_components",
    "sssp",
    "label_propagation",
    "triangle_count",
    "local_clustering_coefficient",
    "company_valuation",
    "game_of_life",
    "schelling_segregation",
    "vertex_coloring",
    "hamiltonian_paths",
    "hits",
    "salsa",
    "katz",
    "ppr_push",
    "maximal_independent_set",
    "maximal_matching",
    "modularity",
    "k_core",
    "core_number",
    "sudoku",
    "SUDOKU1",
    "SUDOKU2",
    "crawl",
    "crawl_pagerank",
    "extract_links",
    "random_walks",
    "strongly_connected_components",
]
