"""Logical expression IR.

Mirrors the reference's ``LogicalExpression``
(crates/grafeo-engine/src/query/plan.rs:861-1034): binary/unary operators,
literals, property access, function calls (scalar + aggregate), CASE, list
literals/index/slice, parameters. Compiled to ``pyspark.sql.Column`` by
plans/compiler.py — every operator maps to a built-in JVM expression, no
Python UDFs in this layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


class Expr:
    pass


@dataclass(frozen=True)
class Lit(Expr):
    value: Any


@dataclass(frozen=True)
class Param(Expr):
    name: str


@dataclass(frozen=True)
class Col(Expr):
    """Reference to a variable in scope (node, edge, or value column)."""

    name: str


@dataclass(frozen=True)
class Prop(Expr):
    """Property access ``var.key``."""

    var: str
    key: str


@dataclass(frozen=True)
class BinOp(Expr):
    """op ∈ = <> < <= > >= + - * / % ^ AND OR XOR IN
    STARTSWITH ENDSWITH CONTAINS REGEX (plan.rs:971-1021)."""

    op: str
    left: Expr
    right: Expr


@dataclass(frozen=True)
class UnOp(Expr):
    """op ∈ NOT NEG ISNULL ISNOTNULL (plan.rs:1024-1034)."""

    op: str
    operand: Expr


@dataclass(frozen=True)
class Fn(Expr):
    """Scalar or aggregate function call; ``distinct`` only for aggregates."""

    name: str
    args: tuple[Expr, ...] = ()
    distinct: bool = False


@dataclass(frozen=True)
class ListLit(Expr):
    items: tuple[Expr, ...]


@dataclass(frozen=True)
class MapLit(Expr):
    items: tuple[tuple[str, Expr], ...]


@dataclass(frozen=True)
class Index(Expr):
    base: Expr
    index: Expr


@dataclass(frozen=True)
class Slice(Expr):
    base: Expr
    lo: Optional[Expr]
    hi: Optional[Expr]


@dataclass(frozen=True)
class Case(Expr):
    """Generic CASE WHEN; ``subject`` set for the simple form."""

    whens: tuple[tuple[Expr, Expr], ...]
    else_: Optional[Expr] = None
    subject: Optional[Expr] = None


@dataclass(frozen=True)
class ListComp(Expr):
    """[x IN list WHERE pred | expr] — compiled to filter()+transform()."""

    var: str
    source: Expr
    where: Optional[Expr] = None
    projection: Optional[Expr] = None


@dataclass(frozen=True)
class Quant(Expr):
    """all/any/none/single(x IN list WHERE pred) — openCypher list
    predicates (reference expr.rs quantifier functions). Lowered to
    forall/exists/size-of-filter higher-order functions."""

    kind: str  # 'all' | 'any' | 'none' | 'single'
    var: str
    source: Expr
    pred: Expr


@dataclass(frozen=True)
class Reduce(Expr):
    """reduce(acc = init, x IN list | expr) — list fold (reference
    expr.rs Reduce). Lowered to F.aggregate with a two-binding lambda."""

    acc: str
    init: Expr
    var: str
    source: Expr
    body: Expr


@dataclass(frozen=True)
class MapProj(Expr):
    """Map projection ``p{.name, .age, extra: expr, .*}`` (openCypher 9):
    selects properties of a graph variable into a record. ``items`` holds
    (key, Expr|None) pairs — None marks a ``.key`` property selector;
    ``star`` includes every property of the variable."""

    var: str
    items: tuple[tuple[str, Optional[Expr]], ...]
    star: bool = False


@dataclass(frozen=True)
class HasLabel(Expr):
    """Label predicate expression ``a:Person[:Employee...]`` — boolean,
    true iff the node has ALL the listed labels (openCypher 9 label
    expression in WHERE/RETURN position)."""

    var: str
    labels: tuple[str, ...]


@dataclass(frozen=True)
class PatternPred(Expr):
    """EXISTS((a)-[:T]->(b)) / size((a)-->(b)) — pattern subquery
    (plan.rs:906-967 Exists/Count subqueries). ``path`` is the parser-level
    PatternPath; the translator lowers it to a semi/anti/count join."""

    path: Any  # lang.cypher.parser.PatternPath (kept opaque to avoid a cycle)
    mode: str = "exists"  # 'exists' | 'count'
    # inner predicate of the EXISTS { [MATCH] pat WHERE ... } subquery form
    # (ast.rs Exists(Box<Query>) carries a full query)
    where: Optional[Expr] = None

    def __eq__(self, other):  # path is unhashable/mutable; identity is fine
        return self is other


@dataclass(frozen=True)
class PatternComp(Expr):
    """[(a)-[:T]->(b) WHERE pred | expr] — pattern comprehension
    (reference cypher/ast.rs:440 PatternComprehension). The translator
    lowers it to a collect join: the pattern subquery grouped by the
    correlated vars, the projection collected into a sorted list, left
    join back, empty array when absent."""

    path: Any  # parser-level PatternPath
    where: Optional[Expr] = None
    proj: Optional[Expr] = None

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)


AGGREGATE_FNS = {
    # reference aggregate enum: aggregate.rs:48-90
    "count",
    "sum",
    "avg",
    "mean",
    "min",
    "max",
    "collect",
    "stdev",
    "stdevp",
    "percentilecont",
    "percentiledisc",
    "first",
    "last_agg",
}


def is_aggregate(e: Expr) -> bool:
    """True if the expression contains an aggregate call (used by the
    translator for Cypher implicit grouping)."""
    if isinstance(e, Fn):
        if e.name.lower() in AGGREGATE_FNS:
            return True
        return any(is_aggregate(a) for a in e.args)
    if isinstance(e, BinOp):
        return is_aggregate(e.left) or is_aggregate(e.right)
    if isinstance(e, UnOp):
        return is_aggregate(e.operand)
    if isinstance(e, Case):
        parts = [w for pair in e.whens for w in pair]
        if e.else_:
            parts.append(e.else_)
        if e.subject:
            parts.append(e.subject)
        return any(is_aggregate(p) for p in parts)
    if isinstance(e, (Index,)):
        return is_aggregate(e.base) or is_aggregate(e.index)
    if isinstance(e, ListLit):
        return any(is_aggregate(i) for i in e.items)
    return False


def variables(e: Expr) -> set[str]:
    out: set[str] = set()

    def walk(x: Expr) -> None:
        if isinstance(x, Col):
            out.add(x.name)
        elif isinstance(x, Prop):
            out.add(x.var)
        elif isinstance(x, BinOp):
            walk(x.left)
            walk(x.right)
        elif isinstance(x, UnOp):
            walk(x.operand)
        elif isinstance(x, Fn):
            for a in x.args:
                walk(a)
        elif isinstance(x, ListLit):
            for i in x.items:
                walk(i)
        elif isinstance(x, MapLit):
            for _, v in x.items:
                walk(v)
        elif isinstance(x, Index):
            walk(x.base)
            walk(x.index)
        elif isinstance(x, Slice):
            walk(x.base)
            if x.lo:
                walk(x.lo)
            if x.hi:
                walk(x.hi)
        elif isinstance(x, Case):
            if x.subject:
                walk(x.subject)
            for c, v in x.whens:
                walk(c)
                walk(v)
            if x.else_:
                walk(x.else_)
        elif isinstance(x, ListComp):
            walk(x.source)
            # bound var excluded
            inner: set[str] = set()
            if x.where:
                inner |= variables(x.where)
            if x.projection:
                inner |= variables(x.projection)
            out.update(inner - {x.var})

    walk(e)
    return out
