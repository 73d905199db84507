"""Graph algorithm library + plugin registry.

The Spark-native counterpart of the reference's plugin system
(crates/grafeo-adapters/src/plugins/traits.rs:7-157 ``Plugin``/
``Algorithm`` with typed parameters, registry.rs, exposed to Python via
bindings/python/src/bridges/algorithms.rs:50-424). Algorithms take/return
DataFrames; ``register``/``run`` provide the by-name extension surface so
user-defined algorithms plug in exactly like the built-ins.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from grafeo_spark.algorithms.centrality import (
    betweenness_centrality,
    closeness_centrality,
    degree_centrality,
    pagerank,
)
from grafeo_spark.algorithms.clustering import (
    average_clustering,
    clustering_coefficient,
    triangle_count,
    triangle_count_per_vertex,
    triangles,
)
from grafeo_spark.algorithms.community import label_propagation, louvain, modularity
from grafeo_spark.algorithms.components import (
    connected_components,
    strongly_connected_components,
    topological_sort,
)
from grafeo_spark.algorithms.flow import max_flow, min_cost_flow
from grafeo_spark.algorithms.mst import minimum_spanning_forest, minimum_spanning_tree
from grafeo_spark.algorithms.paths import (
    a_star,
    bellman_ford,
    bfs,
    dfs,
    dijkstra,
    floyd_warshall,
    shortest_paths,
)
from grafeo_spark.algorithms.pregel import pregel, undirect, vertices_from_edges
from grafeo_spark.algorithms.structure import (
    articulation_points,
    core_number,
    find_bridges,
    k_core,
)


@dataclass
class Algorithm:
    """Registry entry (traits.rs:26 ``Algorithm`` analogue)."""

    name: str
    fn: Callable[..., Any]
    description: str = ""
    categories: tuple[str, ...] = ()


_REGISTRY: dict[str, Algorithm] = {}


def register(name: str, fn: Callable[..., Any], description: str = "", categories=()) -> None:
    """Register an algorithm by name (registry.rs analogue). User-defined
    algorithms (any callable taking an edges DataFrame) plug in here."""
    _REGISTRY[name] = Algorithm(name, fn, description, tuple(categories))


def run(name: str, edges: DataFrame, **params: Any) -> Any:
    """Run a registered algorithm by name with keyword parameters
    (bridges/algorithms.rs:50 dispatch analogue)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown algorithm {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name].fn(edges, **params)


def list_algorithms() -> list[str]:
    return sorted(_REGISTRY)


for _n, _f, _d, _c in [
    ("pagerank", pagerank, "PageRank with dangling redistribution", ("centrality",)),
    ("degree_centrality", degree_centrality, "in/out/both degree", ("centrality",)),
    ("closeness_centrality", closeness_centrality, "BFS closeness", ("centrality",)),
    ("betweenness_centrality", betweenness_centrality, "Brandes (distributed multi-source)", ("centrality",)),
    ("connected_components", connected_components, "WCC via min-label propagation", ("components",)),
    ("strongly_connected_components", strongly_connected_components, "SCC via coloring", ("components",)),
    ("topological_sort", topological_sort, "Kahn levels", ("components",)),
    ("bfs", bfs, "level-synchronous BFS layers", ("traversal",)),
    ("dfs", dfs, "DFS preorder (driver, guarded)", ("traversal",)),
    ("shortest_paths", shortest_paths, "multi-source Bellman-Ford", ("paths",)),
    ("dijkstra", dijkstra, "single-source weighted", ("paths",)),
    ("bellman_ford", bellman_ford, "single-source, negative-safe", ("paths",)),
    ("floyd_warshall", floyd_warshall, "all-pairs (driver, guarded)", ("paths",)),
    ("a_star", a_star, "heuristic search (driver, guarded)", ("paths",)),
    ("label_propagation", label_propagation, "synchronous LPA", ("community",)),
    ("louvain", louvain, "multi-level modularity (driver, guarded)", ("community",)),
    ("triangle_count", triangle_count, "global triangle count", ("clustering",)),
    ("triangle_count_per_vertex", triangle_count_per_vertex, "per-vertex triangles", ("clustering",)),
    ("clustering_coefficient", clustering_coefficient, "local coefficient", ("clustering",)),
    ("k_core", k_core, "iterative degree filter", ("structure",)),
    ("core_number", core_number, "max k per vertex", ("structure",)),
    ("articulation_points", articulation_points, "cut vertices (driver, guarded)", ("structure",)),
    ("find_bridges", find_bridges, "cut edges (driver, guarded)", ("structure",)),
    ("minimum_spanning_forest", minimum_spanning_forest, "Borůvka MSF", ("mst",)),
    ("minimum_spanning_tree", minimum_spanning_tree, "Borůvka MST (connected graphs)", ("mst",)),
    ("max_flow", max_flow, "Edmonds-Karp (driver, guarded)", ("flow",)),
    ("min_cost_flow", min_cost_flow, "successive shortest paths (driver, guarded)", ("flow",)),
]:
    register(_n, _f, _d, _c)

__all__ = [
    "Algorithm",
    "register",
    "run",
    "list_algorithms",
    "pregel",
    "undirect",
    "vertices_from_edges",
    "pagerank",
    "degree_centrality",
    "closeness_centrality",
    "betweenness_centrality",
    "connected_components",
    "strongly_connected_components",
    "topological_sort",
    "bfs",
    "dfs",
    "shortest_paths",
    "dijkstra",
    "bellman_ford",
    "floyd_warshall",
    "a_star",
    "label_propagation",
    "louvain",
    "modularity",
    "triangles",
    "triangle_count",
    "triangle_count_per_vertex",
    "clustering_coefficient",
    "average_clustering",
    "k_core",
    "core_number",
    "articulation_points",
    "find_bridges",
    "minimum_spanning_forest",
    "minimum_spanning_tree",
    "max_flow",
    "min_cost_flow",
]
