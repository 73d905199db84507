"""Interop bridges: PropertyGraph <-> NetworkX.

The reference's most-used Python convenience surface
(bindings/python/src/bridges/networkx.rs:1-7): export a graph snapshot to
``networkx`` for local algorithms/plotting, and import a NetworkX graph as
a PropertyGraph.

Both directions are driver-side by nature (NetworkX is an in-memory
single-machine library), so ``to_networkx`` is SIZE-GUARDED: it refuses
graphs above ``max_nodes``/``max_edges`` instead of silently collecting
100 TB onto the driver. For big graphs, run the distributed algorithms in
:mod:`grafeo_spark.algorithms` instead — that is the scale path; this
bridge is the interactive escape hatch, mirroring the reference's design.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from grafeo_spark.graph import PropertyGraph

DEFAULT_MAX_NODES = 100_000
DEFAULT_MAX_EDGES = 500_000


def to_networkx(
    graph: PropertyGraph,
    directed: bool = True,
    max_nodes: int = DEFAULT_MAX_NODES,
    max_edges: int = DEFAULT_MAX_EDGES,
):
    """Collect a PropertyGraph snapshot into a ``networkx`` (Multi)DiGraph.

    Node attributes: every property column plus ``label``; edge attributes:
    every property column plus ``type``. Parallel edges are preserved via a
    MultiDiGraph/MultiGraph.
    """
    import networkx as nx

    n_nodes = sum(f.count() for f in graph.node_frames.values())
    if n_nodes > max_nodes:
        raise ValueError(
            f"to_networkx guard: {n_nodes} nodes > {max_nodes} "
            "(use grafeo_spark.algorithms for distributed processing)"
        )
    n_edges = sum(f.count() for f in graph.edge_frames.values())
    if n_edges > max_edges:
        raise ValueError(f"to_networkx guard: {n_edges} edges > {max_edges}")

    g = nx.MultiDiGraph() if directed else nx.MultiGraph()
    for label, frame in graph.node_frames.items():
        for row in frame.collect():
            attrs = {k: v for k, v in row.asDict().items() if k != "id" and v is not None}
            g.add_node(row["id"], label=label, **attrs)
    for etype, frame in graph.edge_frames.items():
        for row in frame.collect():
            attrs = {
                k: v
                for k, v in row.asDict().items()
                if k not in ("src", "dst") and v is not None
            }
            g.add_edge(row["src"], row["dst"], type=etype, **attrs)
    return g


def from_networkx(
    spark: SparkSession,
    g: Any,
    default_label: str = "Node",
    default_type: str = "EDGE",
) -> PropertyGraph:
    """Build a PropertyGraph from a NetworkX graph.

    Nodes group by their ``label`` attribute (``default_label`` when
    absent) into one frame per label; edges group by ``type``. Node ids
    must be ints (the DataFrame model's id type). Undirected graphs emit
    each edge once in its NetworkX orientation — expand with direction
    'both' when querying.
    """
    node_rows: dict[str, list[dict]] = {}
    for nid, attrs in g.nodes(data=True):
        if not isinstance(nid, int):
            raise ValueError(f"from_networkx requires int node ids, got {nid!r}")
        label = attrs.get("label", default_label)
        row = {"id": nid, **{k: v for k, v in attrs.items() if k != "label"}}
        node_rows.setdefault(label, []).append(row)
    edge_rows: dict[str, list[dict]] = {}
    for u, v, attrs in g.edges(data=True):
        etype = attrs.get("type", default_type)
        row = {"src": u, "dst": v, **{k: w for k, w in attrs.items() if k != "type"}}
        edge_rows.setdefault(etype, []).append(row)

    def frame(rows: list[dict], base_cols: tuple[str, ...]):
        cols = list(base_cols) + sorted(
            {k for r in rows for k in r} - set(base_cols)
        )
        data = [tuple(r.get(c) for c in cols) for r in rows]
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame(data, columns=cols))

    node_frames = {lbl: frame(rows, ("id",)) for lbl, rows in node_rows.items()}
    edge_frames = {t: frame(rows, ("src", "dst")) for t, rows in edge_rows.items()}
    return PropertyGraph(node_frames, edge_frames)


class SolvORAdapter:
    """solvOR-style Operations-Research surface over a PropertyGraph
    (reference bindings/python/src/bridges/solvor.rs: the second Python
    bridge beside NetworkX). Classic OR problems — shortest paths, network
    flow, spanning trees, components, centrality, communities — returned
    in OR-friendly driver formats: distances with paths, flows with edge
    assignments, dicts keyed by node id.

    Obtained via ``GrafeoSpark.as_solvor()``. The heavy lifting delegates
    to :mod:`grafeo_spark.algorithms`: distributed where the algorithm
    distributes (components, PageRank, MST), driver-side behind the same
    size guards as the reference's in-memory engine where it doesn't
    (flow, Brandes, Floyd-Warshall).
    """

    def __init__(self, graph: PropertyGraph) -> None:
        self.graph = graph

    def _node_ids(self) -> list:
        """Every node id (driver-side; the adapter's dict/list results are
        driver-bound anyway). Ensures isolated nodes — absent from the
        edge list the algorithms derive their vertex sets from — still
        appear in components/centrality/sort results (r5 review)."""
        ids: set = set()
        for f in self.graph.node_frames.values():
            ids.update(r.id for r in f.select("id").collect())
        return sorted(ids)

    def _edges(self, prop: Optional[str], default: float, alias: str):
        e = self.graph.edges()
        if prop is not None:
            if prop not in e.columns:
                raise ValueError(f"edge property {prop!r} not found")
            w = F.col(prop).cast("double")
        else:
            w = F.lit(default)
        return e.select("src", "dst", w.alias(alias))

    # -- shortest paths (solvor.rs shortest_path/all_pairs) ---------------

    def shortest_path(
        self,
        source: int,
        target: int,
        weight: Optional[str] = None,
        method: str = "dijkstra",
    ):
        """(distance, [node ids]) or None if unreachable. ``method`` in
        dijkstra | astar (zero heuristic) | bellman_ford (negative-weight
        capable; raises on a negative cycle)."""
        from grafeo_spark.algorithms.paths import a_star

        e = self._edges(weight, 1.0, "weight")
        if method in ("dijkstra", "astar"):
            got = a_star(e, source, target, weight_col="weight")
            if got is None:
                return None
            path, dist = got
            return dist, path
        if method == "bellman_ford":
            return self._bellman_ford_path(e, source, target)
        raise ValueError(
            f"unknown method {method!r}: use 'dijkstra', 'bellman_ford', or 'astar'"
        )

    @staticmethod
    def _bellman_ford_path(e, source: int, target: int):
        rows = e.collect()
        dist: dict[int, float] = {source: 0.0}
        parent: dict[int, Optional[int]] = {source: None}
        nodes = {source} | {r.src for r in rows} | {r.dst for r in rows}
        for _ in range(len(nodes) - 1):
            changed = False
            for r in rows:
                du = dist.get(r.src)
                if du is not None and du + r.weight < dist.get(r.dst, float("inf")) - 1e-12:
                    dist[r.dst] = du + r.weight
                    parent[r.dst] = r.src
                    changed = True
            if not changed:
                break
        else:
            for r in rows:  # one more relaxation round detects a cycle
                du = dist.get(r.src)
                if du is not None and du + r.weight < dist.get(r.dst, float("inf")) - 1e-12:
                    raise ValueError("graph contains a negative cycle")
        if target not in dist:
            return None
        path = [target]
        while parent[path[-1]] is not None:
            path.append(parent[path[-1]])
        return dist[target], list(reversed(path))

    def all_pairs_shortest_paths(self, weight: Optional[str] = None) -> dict:
        """{(source, target): distance} for every reachable pair
        (Floyd-Warshall, size-guarded like the reference)."""
        from grafeo_spark.algorithms.paths import floyd_warshall

        out = floyd_warshall(self._edges(weight, 1.0, "weight"), weight_col="weight")
        return {(r.src, r.dst): r.distance for r in out.collect()}

    # -- network flow (solvor.rs max_flow/min_cost_max_flow) --------------

    def max_flow(self, source: int, sink: int, capacity: Optional[str] = None) -> dict:
        """{'max_flow': value, 'flow_edges': [(src, dst, flow), ...]}."""
        from grafeo_spark.algorithms.flow import max_flow

        value, assigned = max_flow(
            self._edges(capacity, 1.0, "capacity"), source, sink,
            capacity_col="capacity", with_edges=True,
        )
        return {"max_flow": value, "flow_edges": assigned}

    def min_cost_max_flow(
        self,
        source: int,
        sink: int,
        capacity: Optional[str] = None,
        cost: Optional[str] = None,
    ) -> dict:
        """{'max_flow', 'total_cost', 'flow_edges': [(src, dst, flow,
        unit_cost), ...]} — the maximum flow routed at minimum cost."""
        from grafeo_spark.algorithms.flow import max_flow, min_cost_flow

        e = self.graph.edges()
        caps = (
            F.col(capacity).cast("double") if capacity is not None else F.lit(1.0)
        ).alias("capacity")
        costs = (F.col(cost).cast("double") if cost is not None else F.lit(0.0)).alias(
            "cost"
        )
        ecc = e.select("src", "dst", caps, costs)
        target = max_flow(ecc, source, sink, capacity_col="capacity")
        flow, total_cost, assigned = min_cost_flow(
            ecc, source, sink, target, with_edges=True
        )
        return {"max_flow": flow, "total_cost": total_cost, "flow_edges": assigned}

    # -- spanning tree (solvor.rs minimum_spanning_tree) -------------------

    def minimum_spanning_tree(
        self, weight: Optional[str] = None, method: str = "kruskal"
    ) -> dict:
        """{'edges': [(src, dst, weight), ...], 'total_weight': w}.
        ``method`` is accepted for API parity; the engine's Borůvka MST
        is method-agnostic (the MST itself is unique up to weight ties)."""
        if method not in ("kruskal", "prim"):
            raise ValueError(f"unknown method {method!r}: use 'kruskal' or 'prim'")
        from grafeo_spark.algorithms.mst import minimum_spanning_forest

        mst = minimum_spanning_forest(self._edges(weight, 1.0, "weight"))
        rows = [(r.src, r.dst, r.weight) for r in mst.collect()]
        return {"edges": sorted(rows), "total_weight": sum(w for _, _, w in rows)}

    # -- components (solvor.rs connected/scc/topological) ------------------

    def connected_components(self) -> dict:
        from grafeo_spark.algorithms.components import connected_components

        e = self.graph.edges().select("src", "dst")
        out = {r.id: r.component for r in connected_components(e).collect()}
        for i in self._node_ids():
            out.setdefault(i, i)  # isolated node = its own component
        return out

    def strongly_connected_components(self) -> dict:
        from grafeo_spark.algorithms.components import strongly_connected_components

        e = self.graph.edges().select("src", "dst")
        out = {r.id: r.component for r in strongly_connected_components(e).collect()}
        for i in self._node_ids():
            out.setdefault(i, i)
        return out

    def topological_sort(self):
        """List of node ids in topological order, or None on a cycle."""
        from grafeo_spark.algorithms.components import topological_sort

        try:
            out = topological_sort(self.graph.edges().select("src", "dst"))
        except ValueError:
            return None
        order = [r.id for r in out.orderBy("level", "id").collect()]
        seen = set(order)
        # isolated nodes are unconstrained: any position is valid
        order += [i for i in self._node_ids() if i not in seen]
        return order

    # -- centrality (solvor.rs pagerank/betweenness) -----------------------

    def pagerank(
        self, damping: float = 0.85, max_iter: int = 100, tol: float = 1e-6
    ) -> dict:
        from grafeo_spark.algorithms.centrality import pagerank

        vertices = None
        if self.graph.node_frames:
            frames = [f.select("id") for f in self.graph.node_frames.values()]
            vertices = frames[0]
            for f in frames[1:]:
                vertices = vertices.unionByName(f)
        out = pagerank(
            self.graph.edges().select("src", "dst"),
            alpha=damping, max_iter=max_iter, tol=tol, vertices=vertices,
        )
        return {r.id: r.pagerank for r in out.collect()}

    def betweenness_centrality(self, normalized: bool = True) -> dict:
        from grafeo_spark.algorithms.centrality import betweenness_centrality

        out = betweenness_centrality(
            self.graph.edges().select("src", "dst"), normalized=normalized
        )
        got = {r.id: r.betweenness for r in out.collect()}
        for i in self._node_ids():
            got.setdefault(i, 0.0)
        return got

    # -- communities (solvor.rs louvain) -----------------------------------

    def louvain(self, resolution: float = 1.0) -> dict:
        """{'communities': {id: community}, 'modularity': m,
        'num_communities': n}."""
        if resolution != 1.0:
            raise ValueError("louvain: only resolution=1.0 is supported")
        from grafeo_spark.algorithms.community import louvain, modularity

        e = self.graph.edges().select("src", "dst")
        comm = louvain(e)
        comms = {r.id: r.community for r in comm.collect()}
        for i in self._node_ids():
            comms.setdefault(i, i)  # isolated node = singleton community
        return {
            "communities": comms,
            "modularity": modularity(e, comm),
            "num_communities": len(set(comms.values())),
        }

    # -- structure (solvor.rs articulation_points/bridges/graph_stats) -----

    def articulation_points(self) -> list:
        from grafeo_spark.algorithms.structure import articulation_points

        out = articulation_points(self.graph.edges().select("src", "dst"))
        return [r.id for r in out.collect()]

    def bridges(self) -> list:
        from grafeo_spark.algorithms.structure import find_bridges

        out = find_bridges(self.graph.edges().select("src", "dst"))
        return [(r.src, r.dst) for r in out.collect()]

    def graph_stats(self) -> dict:
        """{'nodes', 'edges', 'density', 'components'}."""
        from grafeo_spark.algorithms.components import connected_components

        n = sum(f.count() for f in self.graph.node_frames.values())
        e = sum(f.count() for f in self.graph.edge_frames.values())
        density = e / (n * (n - 1)) if n > 1 else 0.0
        cc = connected_components(self.graph.edges().select("src", "dst"))
        comps = cc.select("component").distinct().count()
        # isolated nodes are singleton components the edge-derived CC misses
        touched = cc.select("id")
        isolated = 0
        for f in self.graph.node_frames.values():
            isolated += f.select("id").join(touched, "id", "left_anti").count()
        return {
            "nodes": n, "edges": e, "density": density,
            "components": comps + isolated,
        }

    def __repr__(self) -> str:
        n = sum(f.count() for f in self.graph.node_frames.values())
        e = sum(f.count() for f in self.graph.edge_frames.values())
        return f"SolvORAdapter(nodes={n}, edges={e})"


__all__ = ["to_networkx", "from_networkx", "SolvORAdapter"]
