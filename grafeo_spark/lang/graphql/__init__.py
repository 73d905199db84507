"""GraphQL front-end.

Reference mapping (crates/grafeo-engine/src/query/graphql_translator.rs:28,
module docs :1-11): root field → NodeScan by label, field arguments →
equality Filters (plus ``first``/``offset`` pagination), nested selection
set → Expand along the edge type named by the field, scalar fields →
Project. Aliases rename output columns; nested scalars are flattened as
``<fieldAlias>_<prop>`` (the reference likewise returns flat rows).

Example::

    query {
      Customer(mktsegment: "BUILDING", first: 5) {
        name
        acctbal
        orders: PLACED { totalprice orderpriority }
      }
    }
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_spark.graph import PropertyGraph


class GraphQLError(Exception):
    pass


@dataclass
class Field:
    name: str
    alias: Optional[str] = None
    args: list[tuple[str, Any]] = field(default_factory=list)
    selections: list["Field"] = field(default_factory=list)

    @property
    def out_name(self) -> str:
        return self.alias or self.name


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*|,)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>[{}():!\[\]])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise GraphQLError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, src: str) -> None:
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind, text=None):
        k, v = self.peek()
        return k == kind and (text is None or v == text)

    def eat(self, kind, text=None):
        if not self.at(kind, text):
            raise GraphQLError(f"expected {text or kind}, got {self.peek()!r}")
        return self.next()

    def parse(self) -> list[Field]:
        # optional `query [Name]` / `{...}` document
        if self.at("name", "query"):
            self.next()
            if self.at("name"):
                self.next()
        roots = self.selection_set()
        if not self.at("eof"):
            raise GraphQLError(f"unexpected trailing token {self.peek()!r}")
        return roots

    def selection_set(self) -> list[Field]:
        self.eat("op", "{")
        fields = []
        while not self.at("op", "}"):
            fields.append(self.field())
        self.eat("op", "}")
        return fields

    def field(self) -> Field:
        name = self.eat("name")[1]
        alias = None
        if self.at("op", ":"):
            self.next()
            alias, name = name, self.eat("name")[1]
        f = Field(name, alias)
        if self.at("op", "("):
            self.next()
            while not self.at("op", ")"):
                k = self.eat("name")[1]
                self.eat("op", ":")
                f.args.append((k, self.value()))
            self.eat("op", ")")
        if self.at("op", "{"):
            f.selections = self.selection_set()
        return f

    def value(self):
        k, v = self.peek()
        if k == "str":
            self.next()
            return re.sub(r"\\(.)", r"\1", v[1:-1])
        if k == "num":
            self.next()
            return float(v) if "." in v else int(v)
        if k == "name" and v in ("true", "false", "null"):
            self.next()
            return {"true": True, "false": False, "null": None}[v]
        raise GraphQLError(f"expected value, got {self.peek()!r}")


def parse(src: str) -> list[Field]:
    return _Parser(src).parse()


# --------------------------------------------------------------------- #
# compiler
# --------------------------------------------------------------------- #

_PAGINATION = ("first", "limit", "offset")


def _split_args(args: list[tuple[str, Any]]):
    """(filters, label, limit, offset) from a field's argument list."""
    filters: list[tuple[str, Any]] = []
    label = limit = offset = None
    for k, v in args:
        if k in ("first", "limit"):
            limit = int(v)
        elif k == "offset":
            offset = int(v)
        elif k == "label":
            label = v
        else:
            filters.append((k, v))
    return filters, label, limit, offset


def _join_nested(
    graph: PropertyGraph,
    frame: DataFrame,
    parent_id_col: str,
    parent_label: Optional[str],
    sel: Field,
    prefix: str,
) -> tuple[DataFrame, list[str]]:
    """Expand one nested selection (recursively, any depth): join the edge
    type named by the field, then the destination label frame.

    The destination label is resolved from the field's ``label:`` arg, else
    the graph's declared edge endpoints (graphql_translator.rs:28 walks the
    schema the same way) — only unknown endpoints fall back to the
    all-labels union. Argument filters COMPOSE (each restricts the running
    frame), and ``first``/``offset`` paginate PER PARENT (row_number over
    the parent id, ordered by destination id for determinism).
    """
    if sel.name not in graph.edge_frames:
        raise GraphQLError(
            f"unknown edge type {sel.name!r}; known: {graph.edge_types()}"
        )
    filters, label, limit, offset = _split_args(sel.args)
    if label is None:
        ep = graph.endpoints.get(sel.name)
        if ep is not None:
            label = ep[1]
    base = graph.nodes(label) if label else graph.nodes(None)
    for k, v in filters:
        base = base.filter(F.col(k) == F.lit(v))

    child_prefix = prefix + sel.out_name + "_"
    child_id = f"__id_{child_prefix}"
    scalars = [s for s in sel.selections if not s.selections]
    nested = [s for s in sel.selections if s.selections]
    child = base.select(
        F.col("id").alias(child_id),
        *[F.col(s.name).alias(child_prefix + s.out_name) for s in scalars],
    )
    esrc, edst = f"__src_{child_prefix}", f"__dst_{child_prefix}"
    e = graph.edges(sel.name).select(
        F.col("src").alias(esrc), F.col("dst").alias(edst)
    )
    out = (
        frame.join(e, F.col(parent_id_col) == F.col(esrc), "inner")
        .join(child, F.col(edst) == F.col(child_id), "inner")
        .drop(esrc, edst)
    )
    if limit is not None or offset is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(parent_id_col).orderBy(F.col(child_id))
        rn = f"__rn_{child_prefix}"
        out = out.withColumn(rn, F.row_number().over(w))
        lo = offset or 0
        cond = F.col(rn) > lo
        if limit is not None:
            cond = cond & (F.col(rn) <= lo + limit)
        out = out.filter(cond).drop(rn)
    out_cols = [child_prefix + s.out_name for s in scalars]
    for sub in nested:
        out, sub_cols = _join_nested(graph, out, child_id, label, sub, child_prefix)
        out_cols += sub_cols
    return out.drop(child_id), out_cols


def _compile_field(graph: PropertyGraph, root: Field) -> DataFrame:
    if root.name not in graph.node_frames:
        raise GraphQLError(
            f"unknown root type {root.name!r}; known: {graph.labels()}"
        )
    df = graph.nodes(root.name)
    filters, _, limit, offset = _split_args(root.args)
    for k, v in filters:
        df = df.filter(F.col(k) == F.lit(v))
    # root pagination selects root OBJECTS (deterministic by id), before
    # nested expansion multiplies rows
    if offset is not None or limit is not None:
        df = df.orderBy("id")
        if offset is not None:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)

    cols = [F.col(s.name).alias(s.out_name) for s in root.selections if not s.selections]
    out = df
    for sel in root.selections:
        if not sel.selections:
            continue
        out, nested_cols = _join_nested(graph, out, "id", root.name, sel, "")
        cols.extend(F.col(c) for c in nested_cols)
    return out.select(*cols) if cols else out


def execute(graph: PropertyGraph, query: str) -> DataFrame:
    roots = parse(query)
    if len(roots) != 1:
        raise GraphQLError("exactly one root field per query is supported")
    return _compile_field(graph, roots[0])


__all__ = ["parse", "execute", "GraphQLError", "Field"]
