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


def _compile_field(graph: PropertyGraph, root: Field) -> DataFrame:
    if root.name not in graph.node_frames:
        raise GraphQLError(
            f"unknown root type {root.name!r}; known: {graph.labels()}"
        )
    df = graph.nodes(root.name)
    limit = offset = None
    for k, v in root.args:
        if k in ("first", "limit"):
            limit = int(v)
        elif k == "offset":
            offset = int(v)
        else:
            df = df.filter(F.col(k) == F.lit(v))

    cols: list = []
    for sel in _ordered_scalars(root):
        cols.append(F.col(sel.name).alias(sel.out_name))
    out = df
    for sel in root.selections:
        if not sel.selections:
            continue
        # nested selection: expand along edge type sel.name
        if sel.name not in graph.edge_frames:
            raise GraphQLError(
                f"unknown edge type {sel.name!r}; known: {graph.edge_types()}"
            )
        e = graph.edges(sel.name).select(
            F.col("src").alias("__src"), F.col("dst").alias("__dst")
        )
        # destination label: find frames containing dst ids (declared via
        # the nested field's own 'label' arg, else inferred = any label)
        target = None
        for k, v in sel.args:
            if k == "label":
                target = v
        nested_nodes = graph.nodes(target) if target else graph.nodes(None)
        prefix = sel.out_name + "_"
        ncols = [F.col("id").alias("__nid")]
        for s2 in sel.selections:
            if s2.selections:
                raise GraphQLError("selection nesting deeper than 2 not supported yet")
            ncols.append(F.col(s2.name).alias(prefix + s2.out_name))
        nested = nested_nodes.select(*ncols)
        for k, v in sel.args:
            if k not in _PAGINATION and k != "label":
                nested = nested_nodes.filter(F.col(k) == F.lit(v)).select(*ncols)
        out = (
            out.join(e, out["id"] == F.col("__src"), "inner")
            .join(nested, F.col("__dst") == F.col("__nid"), "inner")
            .drop("__src", "__dst", "__nid")
        )
        cols.extend(F.col(prefix + s2.out_name) for s2 in sel.selections)
    result = out.select(*cols) if cols else out
    if offset is not None:
        result = result.offset(offset)
    if limit is not None:
        result = result.limit(limit)
    return result


def _ordered_scalars(f: Field) -> list[Field]:
    return [s for s in f.selections if not s.selections]


def execute(graph: PropertyGraph, query: str) -> DataFrame:
    roots = parse(query)
    if len(roots) != 1:
        raise GraphQLError("exactly one root field per query is supported")
    return _compile_field(graph, roots[0])


__all__ = ["parse", "execute", "GraphQLError", "Field"]
