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


__all__ = ["to_networkx", "from_networkx"]
