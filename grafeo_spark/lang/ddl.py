"""GQL DDL: CREATE NODE TYPE / CREATE EDGE TYPE / CREATE VECTOR INDEX.

The reference carries these at AST level (gql/ast.rs:335-403 —
CreateNodeType/CreateEdgeType/CreateVectorIndex) without a physical
index build; here they populate a schema registry on the engine. Edge-type
declarations additionally feed the graph's ``endpoints`` metadata, which
the compiler uses for destination-join elision and per-frame distinct
reachability — so the DDL is declarative but not inert. Vector-index
declarations record the (label, column, metric, dim) tuple that
``add_srp_buckets`` / ``ann_join`` consume as their precompute contract.

Grammar (case-insensitive keywords):

    CREATE NODE TYPE Name (prop TYPE, ...)
    CREATE EDGE TYPE Name FROM SrcLabel TO DstLabel [(prop TYPE, ...)]
    CREATE VECTOR INDEX name ON Label(column) [DIMENSIONS n] [METRIC m]
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional


class DdlError(Exception):
    pass


@dataclass
class NodeTypeDef:
    name: str
    properties: dict[str, str] = field(default_factory=dict)


@dataclass
class EdgeTypeDef:
    name: str
    src: str
    dst: str
    properties: dict[str, str] = field(default_factory=dict)


@dataclass
class VectorIndexDef:
    name: str
    label: str
    column: str
    dimensions: Optional[int] = None
    metric: str = "cosine"


@dataclass
class SchemaRegistry:
    node_types: dict[str, NodeTypeDef] = field(default_factory=dict)
    edge_types: dict[str, EdgeTypeDef] = field(default_factory=dict)
    vector_indexes: dict[str, VectorIndexDef] = field(default_factory=dict)
    # Declared property indexes (database.rs:785 create_property_index —
    # property-keyed, label-agnostic). In this engine a declaration has no
    # runtime structure to build: equality lookup speed comes from Parquet
    # row-group stats + partition/bucket pruning (SURVEY §4's replacement
    # for the reference's hash/B-tree indexes). Registered so the admin
    # surface (schema()/stats()) reports them, matching the CLI.
    property_indexes: set[str] = field(default_factory=set)


_NODE = re.compile(
    r"^\s*CREATE\s+NODE\s+TYPE\s+(\w+)\s*(?:\(([^)]*)\))?\s*;?\s*$", re.I
)
_EDGE = re.compile(
    r"^\s*CREATE\s+EDGE\s+TYPE\s+(\w+)\s+FROM\s+(\w+)\s+TO\s+(\w+)"
    r"\s*(?:\(([^)]*)\))?\s*;?\s*$",
    re.I,
)
_VINDEX = re.compile(
    r"^\s*CREATE\s+VECTOR\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*\(\s*(\w+)\s*\)"
    r"(?:\s+DIMENSIONS\s+(\d+))?(?:\s+METRIC\s+(\w+))?\s*;?\s*$",
    re.I,
)


def is_ddl(query: str) -> bool:
    q = query.lstrip().upper()
    return q.startswith(("CREATE NODE TYPE", "CREATE EDGE TYPE", "CREATE VECTOR INDEX"))


def _props(spec: Optional[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    if not spec or not spec.strip():
        return out
    for part in spec.split(","):
        bits = part.split()
        if len(bits) != 2:
            raise DdlError(f"bad property declaration: {part.strip()!r}")
        out[bits[0]] = bits[1].upper()
    return out


def execute_ddl(db, query: str):
    """Apply one DDL statement to ``db.ddl`` (creating the registry on
    first use); returns a one-row summary DataFrame."""
    if not hasattr(db, "ddl") or db.ddl is None:
        db.ddl = SchemaRegistry()
    reg: SchemaRegistry = db.ddl

    m = _NODE.match(query)
    if m:
        name, props = m.group(1), _props(m.group(2))
        reg.node_types[name] = NodeTypeDef(name, props)
        return _summary(db, "node_type", name)
    m = _EDGE.match(query)
    if m:
        name, src, dst = m.group(1), m.group(2), m.group(3)
        reg.edge_types[name] = EdgeTypeDef(name, src, dst, _props(m.group(4)))
        if db.graph is not None:
            # declared endpoints feed the compiler's join elision
            db.graph.endpoints[name] = (src, dst)
        return _summary(db, "edge_type", name)
    m = _VINDEX.match(query)
    if m:
        name, label, col = m.group(1), m.group(2), m.group(3)
        dim = int(m.group(4)) if m.group(4) else None
        metric = (m.group(5) or "cosine").lower()
        reg.vector_indexes[name] = VectorIndexDef(name, label, col, dim, metric)
        return _summary(db, "vector_index", name)
    raise DdlError(f"unrecognized DDL statement: {query.strip()[:80]!r}")


def _summary(db, kind: str, name: str):
    from grafeo_spark.graph import local_frame

    return local_frame(db.spark, [(kind, name)], "created string, name string")


__all__ = [
    "SchemaRegistry", "NodeTypeDef", "EdgeTypeDef", "VectorIndexDef",
    "is_ddl", "execute_ddl", "DdlError",
]
