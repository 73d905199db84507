"""Logical plan IR.

A Python mirror of the reference's ``LogicalOperator``
(crates/grafeo-engine/src/query/plan.rs:25-155), trimmed to the operators a
declarative Spark backend needs: scans, expand (1-hop / var-length /
shortest-path), filter, project, aggregate, sort/limit/skip, unwind,
union/distinct. All five front-end languages are meant to lower into this
IR; Catalyst does the optimization the reference implements by hand
(pushdowns, join ordering, constant folding — optimizer/mod.rs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from grafeo_spark.plans.exprs import Expr, Fn

OUT = "out"
IN = "in"
BOTH = "both"


class Plan:
    pass


@dataclass
class NodeScan(Plan):
    """MATCH (v:Label {props}) — label-partitioned scan (scan.rs:10)."""

    var: str
    label: Optional[str] = None
    props: tuple[tuple[str, Expr], ...] = ()


@dataclass
class SingleRow(Plan):
    """Query with no MATCH (single_row.rs:18) — spark.range(1)."""


@dataclass
class Expand(Plan):
    """1-hop expansion (expand.rs:14) or variable-length BFS when
    min_hops/max_hops set (variable_length_expand.rs:15).

    If ``dst_bound`` the destination variable is already in scope and the
    expansion closes a cycle (joins on both endpoints).
    """

    child: Plan
    src_var: str
    dst_var: str
    edge_var: Optional[str] = None
    etypes: tuple[str, ...] = ()
    direction: str = OUT
    dst_label: Optional[str] = None
    dst_props: tuple[tuple[str, Expr], ...] = ()
    edge_props: tuple[tuple[str, Expr], ...] = ()
    min_hops: Optional[int] = None  # None => exactly 1 hop
    max_hops: Optional[int] = None
    optional: bool = False
    dst_bound: bool = False
    where: Optional[Expr] = None  # OPTIONAL MATCH ... WHERE (join condition)
    # Properties of dst_var the statement actually uses (translator's
    # required-column analysis); None = unknown/all. When only {'id'} is
    # needed and the edge type declares a matching endpoint label, the
    # compiler skips the destination node join entirely.
    dst_used: Optional[tuple[str, ...]] = None
    # Same analysis for the SOURCE variable: when the child is a bare
    # label scan, only the id is used, and the edge declares a matching
    # start endpoint, the compiler elides the scan AND the source join
    # (the edge's src column IS the node id).
    src_used: Optional[tuple[str, ...]] = None
    # Set for a var-length segment inside a named path ``p = (a)-[*]->(b)``:
    # the compiler exposes ``<path_alias>__nodes`` (array of node ids after
    # the source) and ``<path_alias>__hops`` columns for path assembly.
    path_alias: Optional[str] = None
    # Property keys the statement references on the var-length edge
    # variable (() = never referenced, None = bare reference / analysis
    # off). Anything beyond 'hops' makes the compiler accumulate the
    # per-hop relationship property structs into a list column so
    # all(r IN rs WHERE r.prop …) and friends work.
    edge_used: Optional[tuple[str, ...]] = None
    # True when the statement accesses relationships(p) of the enclosing
    # named path beyond size(): the compiler additionally exposes
    # ``<path_alias>__rels`` — per-hop edge structs in the UNIFIED path
    # relationship shape (src, dst, type, every edge property declared in
    # the graph) so segments of mixed edge types concat into one list
    # (reference: full edge values on paths, plan.rs:578-598).
    path_rels: bool = False


@dataclass
class DegreeJoin(Plan):
    """Aggregate-below-expand rewrite target (plans/rewrite.py): join the
    per-source edge count (``alias`` column) instead of materializing the
    1-hop expansion row-per-edge. Inner join: sources with zero edges drop,
    matching MATCH semantics. The degree frame pre-filters destinations by
    ``dst_label`` only when the edge-type endpoints don't already guarantee
    it."""

    child: Plan
    src_var: str
    etypes: tuple[str, ...]
    direction: str
    dst_label: Optional[str]
    alias: str


@dataclass
class ShortestPath(Plan):
    """shortestPath((a)-[*..k]->(b)) — BFS (shortest_path.rs:1-18)."""

    child: Plan
    src_var: str
    dst_var: str
    etypes: tuple[str, ...]
    direction: str
    max_hops: int
    hops_alias: str
    all_paths: bool = False
    # *0.. patterns: a node is reachable from itself by the zero-length
    # path, which is then the unique shortest self-path
    min_hops: int = 1
    # Statement uses nodes(p)/relationships(p)/bare p on the path variable:
    # the compiler materializes <alias>__nodes / <alias>__len path-value
    # columns (otherwise only the hop count, the cheap pair-level BFS).
    with_nodes: bool = False
    # relationships(p) consumed as a VALUE: additionally materialize
    # <alias>__rels — per-hop edge structs in the unified path shape
    # (same contract as Expand.path_rels).
    path_rels: bool = False


@dataclass
class Cartesian(Plan):
    """Disconnected pattern components — cross join (NLJ analogue,
    join.rs:578; Catalyst picks BNLJ/cross)."""

    left: Plan
    right: Plan


@dataclass
class OptionalJoin(Plan):
    """OPTIONAL MATCH lowered as a single left join of the whole optional
    pattern against the bound vars (LeftJoinOp, plan.rs:512-521)."""

    left: Plan
    right: Plan
    on_vars: tuple[str, ...]  # shared variables joined on their ids
    where: Optional[Expr] = None


@dataclass
class SemiJoin(Plan):
    """WHERE [NOT] EXISTS((a)-[:T]->(b)) — left-semi/anti join of the
    pattern subquery on the shared variables (plan.rs:906-930 Exists;
    physical Semi/Anti HashJoin, join.rs:8-36)."""

    left: Plan
    right: Plan
    on_vars: tuple[str, ...]
    anti: bool = False


@dataclass
class CountJoin(Plan):
    """size((a)-->(b)) / COUNT subquery — group the pattern subquery by the
    shared vars, count, left join back, 0 when absent (plan.rs:933-967)."""

    left: Plan
    right: Plan
    on_vars: tuple[str, ...]
    alias: str


@dataclass
class CollectJoin(Plan):
    """[(a)-[:T]->(b) WHERE pred | expr] pattern comprehension
    (cypher/ast.rs:440) — group the pattern subquery by the shared vars,
    collect the projection into a sorted list, left join back, [] when
    absent. ``proj``/``where`` are expressions over the subquery scope."""

    left: Plan
    right: Plan
    on_vars: tuple[str, ...]
    alias: str
    proj: object
    where: object = None


@dataclass
class NodesCompJoin(Plan):
    """``[n IN nodes(p) WHERE pred | expr]`` with property access on the
    element — path nodes are materialized as an id array, so property
    reads need a relational hop: posexplode the DISTINCT id arrays, join
    the all-labels node frame, re-collect in path order, join back keyed
    by the array value itself (identical arrays ⇒ identical results,
    which also dedups the property join)."""

    child: Plan
    path_var: str  # path alias whose __nodes column holds the id array
    var: str  # comprehension element variable
    alias: str  # hidden output column
    proj: object = None  # None = the element itself (ids)
    where: object = None


@dataclass
class Filter(Plan):
    child: Plan
    predicate: Expr


@dataclass
class Project(Plan):
    """items: (expr, alias). A bare node/edge variable keeps its binding."""

    child: Plan
    items: tuple[tuple[Expr, str], ...]
    distinct: bool = False


@dataclass
class Aggregate(Plan):
    """keys + aggs, Cypher implicit grouping (aggregate.rs:663)."""

    child: Plan
    keys: tuple[tuple[Expr, str], ...]
    aggs: tuple[tuple[Expr, str], ...]  # exprs containing Fn aggregates


@dataclass
class OrderBy(Plan):
    child: Plan
    keys: tuple[tuple[Expr, bool], ...]  # (expr, ascending)


@dataclass
class Limit(Plan):
    child: Plan
    n: object  # int, or E.Param resolved by the compiler per execution


@dataclass
class Skip(Plan):
    child: Plan
    n: object  # int, or E.Param resolved by the compiler per execution


@dataclass
class Extend(Plan):
    """Add computed value columns, keeping every existing binding (used for
    path-value assembly; the reference materializes Path values in its
    Expand operators, plan.rs:198-200 + logical_type.rs Path)."""

    child: Plan
    items: tuple[tuple[Expr, str], ...]


@dataclass
class Unwind(Plan):
    child: Plan
    expr: Expr
    alias: str


@dataclass
class Union(Plan):
    left: Plan
    right: Plan
    all: bool = False


@dataclass
class Distinct(Plan):
    child: Plan
