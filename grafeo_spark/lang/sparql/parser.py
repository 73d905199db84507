"""SPARQL parser — the SELECT + UPDATE slice.

Covers the reference's core SPARQL query surface
(crates/grafeo-adapters/src/query/sparql/ast.rs — SELECT :51, graph
patterns OPTIONAL/UNION/FILTER :283-346, solution modifiers :471-519):

    PREFIX decls, SELECT [DISTINCT] ?v... | *, WHERE { basic graph
    pattern; FILTER(expr); OPTIONAL { ... }; { ... } UNION { ... } },
    ORDER BY [ASC|DESC](?v), LIMIT, OFFSET.

and the update forms (ast.rs update variants; sparql_translator.rs):

    INSERT DATA { triples }, DELETE DATA { triples },
    DELETE WHERE { pattern }, DELETE { tpl } INSERT { tpl } WHERE { pattern }
    (either template optional), CLEAR ALL.

Terms: ?var, <iri>, prefix:name, "literal" (with optional ^^type), numbers,
``a`` (rdf:type).

Round-3 additions (ast.rs:51-64 query forms, :283-388 patterns):
ASK / CONSTRUCT query forms, VALUES (inline data) and MINUS graph
patterns, property paths (``p1/p2`` sequences desugared to fresh-variable
triples; ``p+`` transitive closure), and aggregate projections
``SELECT (COUNT(?x) AS ?n) ... GROUP BY ?g``.

Round-5 additions: negated property sets ``!(...)`` (ast.rs:416),
``BIND(expr AS ?v)`` (:311), ``FILTER [NOT] EXISTS { }`` (:574-577),
``{ SELECT ... }`` sub-queries (:322), ``GROUP_CONCAT(...; SEPARATOR)`` /
``SAMPLE`` aggregates (:813-819), and ``HAVING``.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Optional, Union

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _unescape(body: str) -> str:
    """SPARQL string escapes (grammar ECHAR + UCHAR \\uXXXX)."""
    return re.sub(
        r"\\u([0-9a-fA-F]{4})|\\(.)",
        lambda m: (
            chr(int(m.group(1), 16))
            if m.group(1)
            else {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}.get(
                m.group(2), m.group(2)
            )
        ),
        body,
    )


class SparqlSyntaxError(Exception):
    pass


# -- terms ----------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Lit:
    value: object
    datatype: Optional[str] = None


Term = Union[Var, Iri, Lit]


@dataclass(frozen=True)
class PathClosure:
    """Closure property paths ``p+`` / ``p*`` / ``p?`` (ast.rs:388
    ZeroOrMore/OneOrMore/ZeroOrOne). SPARQL gives arbitrary-length paths
    SET semantics, so the compiler lowers closures to distinct
    reachability; ``inner`` may itself be any path expression."""

    inner: object
    min_hops: int  # 0 for * and ?, 1 for +
    max_hops: Optional[int]  # None = engine cap; 1 for ?


@dataclass(frozen=True)
class PathAlt:
    """Alternative path ``a|b`` (ast.rs:388 Alternative) — union of the
    branch matches (bag semantics, per spec)."""

    options: tuple


@dataclass(frozen=True)
class PathInverse:
    """Inverse path ``^p`` (ast.rs:388 Inverse) — matches with subject and
    object swapped."""

    inner: object


@dataclass(frozen=True)
class PathNeg:
    """Negated property set ``!iri`` / ``!(a|ex:p|^ex:q)`` (ast.rs:416
    NegatedPropertySet). Per SPARQL 1.1 the set splits by direction:
    the forward arm matches triples whose predicate is NOT in
    ``forward``; the inverse arm matches *reversed* triples whose
    predicate is NOT in ``inverse``. An arm is present only if at least
    one member of that direction was written (``None`` = absent);
    ``()`` (from ``!()``) is a present arm excluding nothing."""

    forward: Optional[tuple]  # tuple of IRI strings, or None
    inverse: Optional[tuple]


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    # Term | PathClosure | PathAlt | PathInverse | PathNeg (top-level
    # sequences are desugared into fresh-variable triples at parse time)
    p: object
    o: Term


# -- filter expressions ---------------------------------------------------


@dataclass(frozen=True)
class FExpr:
    """op in: cmp (=, !=, <, <=, >, >=), and, or, not, regex, bound, call.
    args are FExpr | Term."""

    op: str
    args: tuple


# -- graph patterns -------------------------------------------------------


@dataclass
class GroupPattern:
    triples: list[TriplePattern] = field(default_factory=list)
    filters: list[FExpr] = field(default_factory=list)
    optionals: list["GroupPattern"] = field(default_factory=list)
    unions: list[tuple["GroupPattern", "GroupPattern"]] = field(default_factory=list)
    # VALUES inline data: (variable names, rows of Term|None (UNDEF))
    values: list[tuple[list[str], list[list]]] = field(default_factory=list)
    # MINUS { ... } groups (ast.rs:283-346)
    minuses: list["GroupPattern"] = field(default_factory=list)
    # GRAPH <g>/?g { ... } groups (ast.rs:283-346 Graph): constant graphs
    # filter the store's g column, a variable graph binds it
    graphs: list[tuple[object, "GroupPattern"]] = field(default_factory=list)
    # BIND(expr AS ?v) assignments, in pattern order (ast.rs:311 Bind)
    binds: list[tuple[str, FExpr]] = field(default_factory=list)
    # per-BIND triple cut: how many of this group's triples textually
    # precede bind i. §18.2.2.6: BIND ends the current BGP, so a triple
    # AFTER a BIND joins against the Extend'ed solution — the compiler
    # needs the split points to honor that (probe batch #5).
    bind_cuts: list[int] = field(default_factory=list)
    # FILTER EXISTS { } / FILTER NOT EXISTS { } (ast.rs:574-577)
    exists: list[tuple[bool, "GroupPattern"]] = field(default_factory=list)
    # nested { SELECT ... } sub-queries (ast.rs:322 SubSelect)
    subselects: list["SelectQuery"] = field(default_factory=list)


@dataclass
class SelectQuery:
    variables: list[str]  # empty = * (when no aggregates)
    where: GroupPattern
    distinct: bool = False
    order: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: Optional[int] = None
    offset: Optional[int] = None
    # (fn, var-or-"*", alias, distinct[, separator]) projections:
    # SELECT (COUNT(?x) AS ?n); GROUP_CONCAT carries its SEPARATOR
    aggregates: list[tuple] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: Optional[FExpr] = None
    # general (expr AS ?alias) projections — SPARQL 1.1 SelectClause
    # expressions beyond the aggregate fast path (computed per row)
    select_exprs: list[tuple[str, FExpr]] = field(default_factory=list)
    # fresh-var bindings feeding aggregates over expressions:
    # (AVG(xsd:integer(?a)) AS ?x) binds the cast first, aggregates second
    pre_binds: list[tuple[str, FExpr]] = field(default_factory=list)


@dataclass
class AskQuery:
    where: GroupPattern


@dataclass
class DescribeQuery:
    """DESCRIBE <iri>... / DESCRIBE ?v WHERE { ... } (ast.rs:51-64) —
    returns every triple whose subject is a described resource."""

    terms: list  # Iri | Var
    where: Optional[GroupPattern] = None


@dataclass(frozen=True)
class GraphedTriple:
    """A ground template triple inside ``GRAPH <g> { ... }`` (update data
    blocks only)."""

    tp: TriplePattern
    g: str


@dataclass
class ConstructQuery:
    template: list[TriplePattern]
    where: GroupPattern


@dataclass
class UpdateQuery:
    """kind: insert_data | delete_data | modify | clear | clear_graph |
    create_graph.

    *_data carry ground triples in ``data`` (plain or GraphedTriple);
    modify carries delete/insert templates plus the WHERE pattern (DELETE
    WHERE reuses the pattern as its own delete template). clear_graph
    (also DROP GRAPH) empties one named graph; create_graph is a no-op —
    graphs exist implicitly (plan.rs:665-734)."""

    kind: str
    data: list = field(default_factory=list)  # TriplePattern | GraphedTriple
    delete_tpl: list[TriplePattern] = field(default_factory=list)
    insert_tpl: list[TriplePattern] = field(default_factory=list)
    where: Optional[GroupPattern] = None
    graph: Optional[str] = None
    # COPY/MOVE/ADD <src> TO <dst> (plan.rs:665-734); None = default graph
    graph2: Optional[str] = None


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<lang>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<num>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z_][A-Za-z0-9_.-]*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\^\^|&&|\|\||!=|<=|>=|[{}()\[\].;,=<>!*/:a+|^?-])
    """,
    re.VERBOSE,
)


_AGG_NAMES = {"count", "sum", "avg", "min", "max", "sample", "group_concat"}


def tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise SparqlSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


class Parser:
    def __init__(self, src: str) -> None:
        self.toks = tokenize(src)
        self.i = 0
        self.prefixes: dict[str, str] = {
            "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
            "xsd": "http://www.w3.org/2001/XMLSchema#",
        }

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind: str, text: Optional[str] = None) -> bool:
        k, v = self.peek()
        return k == kind and (text is None or v.upper() == text.upper())

    def eat(self, kind: str, text: Optional[str] = None):
        if not self.at(kind, text):
            raise SparqlSyntaxError(f"expected {text or kind}, got {self.peek()!r}")
        return self.next()

    # -- entry ------------------------------------------------------------

    def parse(self) -> Union[SelectQuery, UpdateQuery]:
        while self.at("name", "PREFIX"):
            self.next()
            pname = self.eat("pname")[1] if self.at("pname") else self.eat("name")[1] + self.eat("op", ":")[1]
            if pname.endswith(":"):
                pfx = pname[:-1]
            else:
                pfx = pname.split(":", 1)[0]
            iri = self.eat("iri")[1][1:-1]
            self.prefixes[pfx] = iri
        if (
            self.at("name", "INSERT")
            or self.at("name", "DELETE")
            or self.at("name", "CLEAR")
            or self.at("name", "DROP")
            or self.at("name", "CREATE")
            or self.at("name", "COPY")
            or self.at("name", "MOVE")
            or self.at("name", "ADD")
            or self.at("name", "LOAD")
        ):
            return self._update()
        if self.at("name", "DESCRIBE"):
            self.next()
            terms: list = []
            while self.at("iri") or self.at("pname") or self.at("var"):
                terms.append(self.term())
            where = None
            if self.at("name", "WHERE"):
                self.next()
                where = self.group()
            elif self.at("op", "{"):
                where = self.group()
            if not terms:
                raise SparqlSyntaxError("DESCRIBE needs at least one term")
            q = DescribeQuery(terms, where)
            if not self.at("eof"):
                raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
            return q
        if self.at("name", "ASK"):
            self.next()
            if self.at("name", "WHERE"):
                self.next()
            q = AskQuery(self.group())
            if not self.at("eof"):
                raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
            return q
        if self.at("name", "CONSTRUCT"):
            self.next()
            if self.at("name", "WHERE"):
                # CONSTRUCT WHERE { BGP } shorthand (§10.2.2): the
                # template IS the pattern (plain triples only)
                self.next()
                where = self.group()
                for tp in where.triples:
                    if not isinstance(tp.p, (Iri, Var)):
                        raise SparqlSyntaxError(
                            "CONSTRUCT WHERE allows only plain triple patterns"
                        )
                q = ConstructQuery(list(where.triples), where)
            else:
                tpl = self._template()
                self.eat("name", "WHERE")
                q = ConstructQuery(tpl, self.group())
            if not self.at("eof"):
                raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
            return q
        return self._select()

    def _select(self, nested: bool = False) -> SelectQuery:
        self.eat("name", "SELECT")
        distinct = False
        if self.at("name", "DISTINCT"):
            self.next()
            distinct = True
        elif self.at("name", "REDUCED"):
            # SELECT REDUCED (ast.rs Reduced): PERMITS eliminating
            # duplicates without requiring it — any level of dedup is
            # spec-conformant, so it compiles exactly like DISTINCT
            self.next()
            distinct = True
        variables: list[str] = []
        aggregates: list[tuple[str, str, str, bool]] = []
        select_exprs: list[tuple[str, FExpr]] = []
        pre_binds: list[tuple[str, FExpr]] = []
        if self.at("op", "*"):
            self.next()
        else:
            while self.at("var") or self.at("op", "("):
                if self.at("var"):
                    variables.append(self.next()[1][1:])
                    continue
                # (AGG([DISTINCT] ?v | *) AS ?alias) — the aggregate fast
                # path, which also owns the GROUP_CONCAT SEPARATOR form
                snap = self.i
                try:
                    self.next()  # '('
                    fname = self.eat("name")[1].lower()
                    self.eat("op", "(")
                    agg_distinct = False
                    if self.at("name", "DISTINCT"):
                        self.next()
                        agg_distinct = True
                    if self.at("op", "*"):
                        self.next()
                        arg = "*"
                    else:
                        arg = self.eat("var")[1][1:]
                    sep = None
                    if self.at("op", ";"):
                        # GROUP_CONCAT(?v; SEPARATOR=", ") (ast.rs:819)
                        self.next()
                        kw = self.eat("name")[1]
                        if kw.upper() != "SEPARATOR":
                            raise SparqlSyntaxError(f"expected SEPARATOR, got {kw!r}")
                        self.eat("op", "=")
                        sep = _unescape(self.eat("str")[1][1:-1])
                    self.eat("op", ")")
                    self.eat("name", "AS")
                    alias = self.eat("var")[1][1:]
                    self.eat("op", ")")
                except SparqlSyntaxError:
                    # general (expr AS ?alias) projection (SPARQL 1.1
                    # SelectClause expressions): restore and re-parse as a
                    # full expression; an aggregate over a computed arg
                    # binds the arg to a fresh var first
                    self.i = snap
                    self.next()  # '('
                    e = self.filter_expr()
                    self.eat("name", "AS")
                    alias = self.eat("var")[1][1:]
                    self.eat("op", ")")
                    if (
                        isinstance(e, FExpr)
                        and e.op.startswith("call:")
                        and e.op[5:] in _AGG_NAMES
                        and len(e.args) == 2
                        and isinstance(e.args[-1], FExpr)
                        and e.args[-1].op == "__aggmeta__"
                    ):
                        fresh = f"__selarg{len(pre_binds)}"
                        pre_binds.append((fresh, e.args[0]))
                        m_distinct, m_sep = e.args[-1].args
                        if m_sep is None:
                            aggregates.append((e.op[5:], fresh, alias, m_distinct))
                        else:
                            aggregates.append(
                                (e.op[5:], fresh, alias, m_distinct, m_sep)
                            )
                    else:
                        select_exprs.append((alias, e))
                    continue
                if fname in _AGG_NAMES:
                    if sep is None:
                        aggregates.append((fname, arg, alias, agg_distinct))
                    else:
                        aggregates.append((fname, arg, alias, agg_distinct, sep))
                else:
                    # a builtin call that happened to fit the narrow
                    # grammar, e.g. (STRLEN(?n) AS ?l) — per-row expr
                    select_exprs.append(
                        (alias, FExpr("call:" + fname, (Var(arg),)))
                    )
        self.eat("name", "WHERE")
        where = self.group()
        group_by: list = []
        if self.at("name", "GROUP"):
            self.next()
            self.eat("name", "BY")
            # GroupCondition (§19.8 [20]): Var | '(' Expr ('AS' Var)? ')'
            # | BuiltInCall/FunctionCall. Expression conditions are stored
            # as (alias-or-None, FExpr) tuples; a bare expression gets a
            # hidden key downstream (not projectable, per spec).
            _stop = {"HAVING", "ORDER", "LIMIT", "OFFSET", "VALUES"}
            while True:
                if self.at("var"):
                    group_by.append(self.next()[1][1:])
                elif self.at("op", "("):
                    self.next()
                    ge = self.filter_expr()
                    alias = None
                    if self.at("name", "AS"):
                        self.next()
                        alias = self.eat("var")[1][1:]
                    self.eat("op", ")")
                    group_by.append((alias, ge))
                elif (
                    self.at("name")
                    and self.peek()[1].upper() not in _stop
                    and self.toks[self.i + 1] == ("op", "(")
                ):
                    group_by.append((None, self.filter_expr()))
                else:
                    break
        having = None
        if self.at("name", "HAVING"):
            self.next()
            self.eat("op", "(")
            having = self.filter_expr()
            self.eat("op", ")")
        # order terms: a bare var name (str), or an expression / aggregate
        # call (FExpr) — ORDER BY DESC(COUNT(?c)), ORDER BY STRLEN(?nm)
        # (SPARQL 1.1 §15.1 OrderCondition allows any expression)
        order: list[tuple[object, bool]] = []
        limit = offset = None
        if self.at("name", "ORDER"):
            self.next()
            self.eat("name", "BY")
            while True:
                asc = True
                if self.at("name", "ASC") or self.at("name", "DESC"):
                    asc = self.next()[1].upper() == "ASC"
                    self.eat("op", "(")
                    if self.at("var") and self.toks[self.i + 1] == ("op", ")"):
                        v: object = self.next()[1][1:]
                    else:
                        v = self.filter_expr()
                    self.eat("op", ")")
                elif self.at("var"):
                    v = self.next()[1][1:]
                elif (
                    self.at("name")
                    and self.peek()[1].upper() not in ("LIMIT", "OFFSET")
                    and self.toks[self.i + 1] == ("op", "(")
                ) or (
                    # bare FunctionCall OrderCondition (grammar [24]):
                    # ORDER BY xsd:integer(?a)
                    self.at("pname")
                    and self.toks[self.i + 1][:2] == ("op", "(")
                ):
                    v = self.filter_expr()
                else:
                    break
                order.append((v, asc))
        while self.at("name", "LIMIT") or self.at("name", "OFFSET"):
            kw = self.next()[1].upper()
            n = int(self.eat("num")[1])
            if kw == "LIMIT":
                limit = n
            else:
                offset = n
        if self.at("name", "VALUES"):
            # trailing ValuesClause (SPARQL grammar [28]): joined to the
            # WHERE group — equivalent for the non-aggregated queries the
            # clause is used for (the reference routes inline data the
            # same way, sparql_translator.rs VALUES handling)
            self.next()
            where.values.append(self._values_block())
        if not nested and not self.at("eof"):
            raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
        return SelectQuery(
            variables, where, distinct, order, limit, offset, aggregates,
            group_by, having, select_exprs, pre_binds,
        )

    # -- updates ----------------------------------------------------------

    def _update(self) -> UpdateQuery:
        if self.at("name", "CLEAR") or self.at("name", "DROP"):
            self.next()
            if self.at("name", "ALL"):
                self.next()
                q = UpdateQuery("clear")
            else:
                self.eat("name", "GRAPH")
                g = self.term()
                if not isinstance(g, Iri):
                    raise SparqlSyntaxError("CLEAR/DROP GRAPH needs an IRI")
                q = UpdateQuery("clear_graph", graph=g.value)
        elif self.at("name", "CREATE"):
            self.next()
            self.eat("name", "GRAPH")
            g = self.term()
            if not isinstance(g, Iri):
                raise SparqlSyntaxError("CREATE GRAPH needs an IRI")
            q = UpdateQuery("create_graph", graph=g.value)
        elif self.at("name", "COPY") or self.at("name", "MOVE") or self.at("name", "ADD"):
            kind = {"copy": "copy_graph", "move": "move_graph", "add": "add_graph"}[
                self.next()[1].lower()
            ]
            src = self._graph_ref()
            self.eat("name", "TO")
            q = UpdateQuery(kind, graph=src, graph2=self._graph_ref())
        elif self.at("name", "LOAD"):
            self.next()
            doc = self.term()
            if not isinstance(doc, Iri):
                raise SparqlSyntaxError("LOAD needs a document IRI")
            dest = None
            if self.at("name", "INTO"):
                self.next()
                dest = self._graph_ref()
            q = UpdateQuery("load_graph", graph=doc.value, graph2=dest)
        elif self.at("name", "INSERT"):
            self.next()
            if self.at("name", "DATA"):
                self.next()
                q = UpdateQuery("insert_data", data=self._template())
            else:
                tpl = self._template()
                self.eat("name", "WHERE")
                q = UpdateQuery("modify", insert_tpl=tpl, where=self.group())
        else:
            self.eat("name", "DELETE")
            if self.at("name", "DATA"):
                self.next()
                q = UpdateQuery("delete_data", data=self._template())
            elif self.at("name", "WHERE"):
                self.next()
                where = self.group()
                q = UpdateQuery("modify", delete_tpl=list(where.triples), where=where)
            else:
                delete_tpl = self._template()
                insert_tpl: list[TriplePattern] = []
                if self.at("name", "INSERT"):
                    self.next()
                    insert_tpl = self._template()
                self.eat("name", "WHERE")
                q = UpdateQuery(
                    "modify",
                    delete_tpl=delete_tpl,
                    insert_tpl=insert_tpl,
                    where=self.group(),
                )
        if not self.at("eof"):
            raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
        return q

    def _graph_ref(self) -> Optional[str]:
        """[GRAPH] <iri> | DEFAULT — a COPY/MOVE/ADD operand; None is the
        default graph."""
        if self.at("name", "DEFAULT"):
            self.next()
            return None
        if self.at("name", "GRAPH"):
            self.next()
        g = self.term()
        if not isinstance(g, Iri):
            raise SparqlSyntaxError("graph reference needs an IRI or DEFAULT")
        return g.value

    def _template(self) -> list:
        """{ triples } with no FILTER/OPTIONAL/UNION (an update template);
        ``GRAPH <g> { ... }`` blocks wrap their triples as GraphedTriple."""
        self.eat("op", "{")
        triples: list = []
        while not self.at("op", "}"):
            if self.at("name", "GRAPH"):
                self.next()
                g = self.term()
                if not isinstance(g, Iri):
                    raise SparqlSyntaxError("GRAPH in a data block needs an IRI")
                for tp in self._template():
                    if isinstance(tp, GraphedTriple):
                        raise SparqlSyntaxError("nested GRAPH blocks")
                    triples.append(GraphedTriple(tp, g.value))
            else:
                triples.extend(self.triple_block())
            if self.at("op", "."):
                self.next()
        self.eat("op", "}")
        return triples

    # -- graph patterns ---------------------------------------------------

    def group(self) -> GroupPattern:
        self.eat("op", "{")
        g = GroupPattern()
        while not self.at("op", "}"):
            if self.at("name", "FILTER"):
                self.next()
                # FILTER EXISTS { } / FILTER NOT EXISTS { } (ast.rs:574)
                if self.at("name", "EXISTS"):
                    self.next()
                    g.exists.append((True, self.group()))
                elif self.at("name", "NOT"):
                    self.next()
                    self.eat("name", "EXISTS")
                    g.exists.append((False, self.group()))
                elif self.at("op", "("):
                    self.next()
                    g.filters.append(self.filter_expr())
                    self.eat("op", ")")
                else:
                    # bare BuiltInCall constraint — SPARQL grammar [68]
                    # Constraint ::= BrackettedExpression | BuiltInCall |
                    # FunctionCall, e.g. FILTER sameTerm(?a, ex:alice)
                    g.filters.append(self.filter_expr())
            elif self.at("name", "BIND"):
                # BIND(expr AS ?v) (ast.rs:311)
                self.next()
                self.eat("op", "(")
                e = self.filter_expr()
                self.eat("name", "AS")
                v = self.eat("var")[1][1:]
                self.eat("op", ")")
                g.binds.append((v, e))
                g.bind_cuts.append(len(g.triples))
            elif self.at("name", "OPTIONAL"):
                self.next()
                g.optionals.append(self.group())
            elif self.at("name", "MINUS"):
                self.next()
                g.minuses.append(self.group())
            elif self.at("name", "VALUES"):
                self.next()
                g.values.append(self._values_block())
            elif self.at("name", "GRAPH"):
                self.next()
                gterm = self.term()
                if not isinstance(gterm, (Iri, Var)):
                    raise SparqlSyntaxError("GRAPH needs an IRI or variable")
                g.graphs.append((gterm, self.group()))
            elif self.at("name", "SERVICE"):
                # SERVICE [SILENT] <endpoint> { ... } (ast.rs:324-331).
                # The reference evaluates the pattern against the LOCAL
                # store, ignoring the endpoint (sparql_translator.rs:673-680)
                # — federation is not implemented there either; we match
                # that behavior by folding the inner group into this one.
                self.next()
                if self.at("name", "SILENT"):
                    self.next()
                endpoint = self.term()
                if not isinstance(endpoint, (Iri, Var)):
                    raise SparqlSyntaxError("SERVICE needs an IRI or variable")
                inner = self.group()
                base = len(g.triples)  # rebase inner bind cuts onto ours
                for fld in dataclasses.fields(GroupPattern):
                    if fld.name == "bind_cuts":
                        g.bind_cuts.extend(c + base for c in inner.bind_cuts)
                    else:
                        getattr(g, fld.name).extend(getattr(inner, fld.name))
            elif self.at("op", "{"):
                # peek past '{': a SELECT keyword means a sub-query
                # (ast.rs:322 SubSelect), otherwise a UNION group chain
                nxt = self.toks[self.i + 1]
                if nxt[0] == "name" and nxt[1].upper() == "SELECT":
                    self.next()
                    g.subselects.append(self._select(nested=True))
                    self.eat("op", "}")
                    if self.at("op", "."):
                        self.next()
                    continue
                left = self.group()
                self.eat("name", "UNION")
                right = self.group()
                while self.at("name", "UNION"):
                    self.next()
                    extra = self.group()
                    merged = GroupPattern(unions=[(left, right)])
                    left, right = merged, extra
                g.unions.append((left, right))
            else:
                g.triples.extend(self.triple_block())
            if self.at("op", "."):
                self.next()
        self.eat("op", "}")
        return g

    def _values_block(self) -> tuple[list[str], list[list]]:
        """``VALUES ?x { t1 t2 }`` or ``VALUES (?x ?y) { (a b) (c d) }``;
        UNDEF rows hold None."""
        if self.at("var"):
            names = [self.next()[1][1:]]
            self.eat("op", "{")
            rows: list[list] = []
            while not self.at("op", "}"):
                rows.append([self._values_term()])
            self.eat("op", "}")
            return names, rows
        self.eat("op", "(")
        names = []
        while self.at("var"):
            names.append(self.next()[1][1:])
        self.eat("op", ")")
        self.eat("op", "{")
        rows = []
        while self.at("op", "("):
            self.next()
            row = []
            while not self.at("op", ")"):
                row.append(self._values_term())
            self.eat("op", ")")
            if len(row) != len(names):
                raise SparqlSyntaxError("VALUES row arity mismatch")
            rows.append(row)
        self.eat("op", "}")
        return names, rows

    def _values_term(self):
        if self.at("name", "UNDEF"):
            self.next()
            return None
        return self.term()

    def _expand_path(self, s: Term, p, o: Term, out: list[TriplePattern]) -> None:
        """Desugar a sequence path into fresh-variable triples."""
        if isinstance(p, tuple) and p[0] == "seq":
            self._ppn = getattr(self, "_ppn", 0) + 1
            mid = Var(f"__pp{self._ppn}")
            self._expand_path(s, p[1], mid, out)
            self._expand_path(mid, p[2], o, out)
        elif isinstance(p, PathInverse):
            # top-level inverse: swap subject and object, recurse
            self._expand_path(o, p.inner, s, out)
        else:
            out.append(TriplePattern(s, p, o))

    def triple_block(self) -> list[TriplePattern]:
        s = self.term()
        out = []
        # a blank-node property list in SUBJECT position may be the whole
        # block: `[ ex:p 1 ] .` — its buffered triples are the block
        if self.at("op", ".") or self.at("op", "}"):
            return self._drain_pending(out)
        while True:
            p = self.predicate()
            o = self.term()
            self._expand_path(s, p, o, out)
            if self.at("op", ";"):
                self.next()
                if self.at("op", ".") or self.at("op", "}"):
                    break
                continue
            if self.at("op", ","):
                self.next()
                while True:
                    o2 = self.term()
                    self._expand_path(s, p, o2, out)
                    if self.at("op", ","):
                        self.next()
                        continue
                    break
            break
        return self._drain_pending(out)

    def _drain_pending(self, out: list) -> list:
        """Append (and clear) triples buffered by blank-node property
        lists parsed inside this block's terms."""
        pending = getattr(self, "_pending_triples", None)
        if pending:
            out.extend(pending)
            pending.clear()
        return out

    def predicate(self):
        """Predicate term or property path (ast.rs:388): ``p1/p2``
        sequences (returned as nested ('seq', a, b) tuples, desugared by
        the caller), ``a|b`` alternatives, ``^p`` inverse, ``!(...)``
        negated property sets, and the ``+``/``*``/``?`` closures —
        composable, e.g. ``^(a|b)/c+`` or ``!(ex:p|^ex:q)``."""
        left = self._path_seq()
        if self.at("op", "|"):
            opts = [left]
            while self.at("op", "|"):
                self.next()
                opts.append(self._path_seq())
            return PathAlt(tuple(opts))
        return left

    def _path_seq(self):
        left = self._path_elt()
        while self.at("op", "/"):
            self.next()
            left = ("seq", left, self._path_elt())
        return left

    def _nps_member(self) -> tuple[bool, str]:
        """One PathOneInPropertySet: ``iri``, ``a``, or their ``^`` forms."""
        inv = False
        if self.at("op", "^"):
            self.next()
            inv = True
        if self.at("op", "a") or self.at("name", "a"):
            self.next()
            return inv, RDF_TYPE
        t = self.term()
        if not isinstance(t, Iri):
            raise SparqlSyntaxError("negated property set members must be IRIs")
        return inv, t.value

    def _path_elt(self):
        if self.at("op", "^"):
            self.next()
            return PathInverse(self._path_elt())
        if self.at("op", "!"):
            # negated property set (ast.rs:416): !iri | !(a|iri|^iri|...)
            self.next()
            fwd: list[str] = []
            inv: list[str] = []
            has_f = has_i = False
            if self.at("op", "("):
                self.next()
                while not self.at("op", ")"):
                    i, v = self._nps_member()
                    if i:
                        inv.append(v)
                        has_i = True
                    else:
                        fwd.append(v)
                        has_f = True
                    if self.at("op", "|"):
                        self.next()
                        continue
                    break
                self.eat("op", ")")
                if not (has_f or has_i):
                    has_f = True  # !() excludes nothing: any forward triple
            else:
                i, v = self._nps_member()
                if i:
                    inv.append(v)
                    has_i = True
                else:
                    fwd.append(v)
                    has_f = True
            base = PathNeg(
                tuple(fwd) if has_f else None, tuple(inv) if has_i else None
            )
            # fall through: closure suffixes apply to an NPS too (!(p)* is
            # legal — PathPrimary includes the NPS form)
            if self.at("op", "+"):
                self.next()
                return PathClosure(base, 1, None)
            if self.at("op", "*"):
                self.next()
                return PathClosure(base, 0, None)
            if self.at("op", "?"):
                self.next()
                return PathClosure(base, 0, 1)
            return base
        if self.at("op", "("):
            self.next()
            base = self.predicate()
            self.eat("op", ")")
        elif self.at("op", "a") or self.at("name", "a"):
            self.next()
            base = Iri(RDF_TYPE)
        else:
            base = self.term()
        if self.at("op", "+"):
            self.next()
            return PathClosure(base, 1, None)
        if self.at("op", "*"):
            self.next()
            return PathClosure(base, 0, None)
        if self.at("op", "?"):
            self.next()
            return PathClosure(base, 0, 1)
        return base

    def term(self) -> Term:
        k, v = self.peek()
        if k == "op" and v == "[" and self.toks[self.i + 1] == ("op", "]"):
            # bare [] — an anonymous blank node, i.e. a fresh anonymous
            # variable (sparql_translator.rs:736 BlankNode::Anonymous)
            self.next()
            self.next()
            self._anon_bnodes = getattr(self, "_anon_bnodes", 0) + 1
            return Var(f"_:anon{self._anon_bnodes}")
        if k == "op" and v == "[":
            # blank node property list [ p o ; p2 o2, o3 ] — a fresh
            # anonymous variable as subject, its triples buffered onto the
            # enclosing triple block (parser.rs:960-973 blank_subject +
            # parse_property_list_not_empty)
            self.next()
            self._anon_bnodes = getattr(self, "_anon_bnodes", 0) + 1
            subj = Var(f"_:anon{self._anon_bnodes}")
            pending = getattr(self, "_pending_triples", None)
            if pending is None:
                pending = self._pending_triples = []
            while True:
                p = self.predicate()
                o = self.term()
                self._expand_path(subj, p, o, pending)
                while self.at("op", ","):
                    self.next()
                    o2 = self.term()
                    self._expand_path(subj, p, o2, pending)
                if self.at("op", ";"):
                    self.next()
                    if self.at("op", "]"):
                        break
                    continue
                break
            self.eat("op", "]")
            return subj
        if k == "var":
            self.next()
            return Var(v[1:])
        if k == "iri":
            self.next()
            return Iri(v[1:-1])
        if k == "pname":
            self.next()
            pfx, local = v.split(":", 1)
            if pfx == "_":
                # blank node label: an anonymous variable scoped to the
                # query — exactly the reference's lowering
                # (sparql_translator.rs:730-740 maps _:label to the
                # variable "_:label"); the "_: " name prefix keeps it
                # from colliding with any user ?variable
                return Var(f"_:{local}")
            if pfx not in self.prefixes:
                raise SparqlSyntaxError(f"unknown prefix {pfx!r}")
            return Iri(self.prefixes[pfx] + local)
        if k == "str":
            self.next()
            val = _unescape(v[1:-1])
            dt = None
            if self.at("lang"):
                # language-tagged literal 'a'@en (reference ast.rs:427
                # language: Option<String>) — the collapsed lexical store
                # keeps only the lexical form, so the tag parses and
                # drops; LANG() is "" over this model (see _builtin)
                self.next()
            elif self.at("op", "^^"):
                self.next()
                dt_term = self.term()
                dt = dt_term.value if isinstance(dt_term, Iri) else None
            return Lit(val, dt)
        if k == "num":
            self.next()
            return Lit(float(v) if ("." in v or "e" in v or "E" in v) else int(v))
        raise SparqlSyntaxError(f"expected term, got {self.peek()!r}")

    # -- filter expressions ----------------------------------------------

    def filter_expr(self) -> FExpr:
        return self.or_expr()

    def or_expr(self) -> FExpr:
        left = self.and_expr()
        while self.at("op", "||"):
            self.next()
            left = FExpr("or", (left, self.and_expr()))
        return left

    def and_expr(self) -> FExpr:
        left = self.unary_expr()
        while self.at("op", "&&"):
            self.next()
            left = FExpr("and", (left, self.unary_expr()))
        return left

    def unary_expr(self) -> FExpr:
        if self.at("op", "!"):
            self.next()
            return FExpr("not", (self.unary_expr(),))
        return self.cmp_expr()

    def cmp_expr(self) -> FExpr:
        left = self.add_expr()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            return FExpr(v, (left, self.add_expr()))
        if k == "name" and v.upper() in ("IN", "NOT"):
            # ?x IN (e1, e2, ...) / ?x NOT IN (...) (SPARQL 1.1 §17.4.1)
            neg = v.upper() == "NOT"
            snap = self.i
            self.next()
            if neg:
                if not self.at("name", "IN"):
                    self.i = snap
                    return left
                self.next()
            self.eat("op", "(")
            items = []
            while not self.at("op", ")"):
                items.append(self.filter_expr())
                if self.at("op", ","):
                    self.next()
            self.eat("op", ")")
            e = FExpr("in", (left, *items))
            return FExpr("not", (e,)) if neg else e
        # bare term / call (effective boolean value, or a function argument)
        return left

    # XSD constructor casts usable as functions (SPARQL 1.1 §17.5; a
    # superset of the reference, which has no cast functions —
    # planner_rdf.rs:1927+ resolves only the builtin list)
    XSD = "http://www.w3.org/2001/XMLSchema#"
    _CASTS = {
        XSD + "integer": "long",
        XSD + "int": "int",
        XSD + "long": "long",
        XSD + "decimal": "double",
        XSD + "double": "double",
        XSD + "float": "float",
        XSD + "string": "string",
        XSD + "boolean": "boolean",
        XSD + "dateTime": "timestamp",
        XSD + "date": "date",
    }

    def add_expr(self) -> FExpr:
        """Additive level (SPARQL 1.1 §17 AdditiveExpression). The
        tokenizer folds a sign into adjacent numeric literals, so
        ``?x -5`` arrives as a signed number — the grammar's
        NumericLiteralPositive/Negative branch handles exactly this."""
        left = self.mul_expr()
        while True:
            if self.at("op", "+") or self.at("op", "-"):
                op = self.next()[1]
                left = FExpr(op, (left, self.mul_expr()))
            elif self.at("num") and self.peek()[1][0] in "+-":
                v = self.next()[1]
                left = FExpr("+", (left, Lit(float(v) if ("." in v or "e" in v or "E" in v) else int(v))))
            else:
                return left

    def mul_expr(self) -> FExpr:
        left = self.primary()
        while self.at("op", "*") or self.at("op", "/"):
            op = self.next()[1]
            left = FExpr(op, (left, self.primary()))
        return left

    def primary(self):
        if self.at("op", "-"):
            # unary minus (UnaryExpression)
            self.next()
            return FExpr("neg", (self.primary(),))
        if self.at("op", "("):
            self.next()
            e = self.filter_expr()
            self.eat("op", ")")
            return e
        if self.at("pname") and self.toks[self.i + 1][:2] == ("op", "("):
            iri = self.term()
            if isinstance(iri, Iri) and iri.value in self._CASTS:
                self.eat("op", "(")
                arg = self.filter_expr()
                self.eat("op", ")")
                return FExpr("cast:" + self._CASTS[iri.value], (arg,))
            raise SparqlSyntaxError(f"unknown function <{iri.value}>")
        if self.at("name"):
            nm = self.peek()[1].upper()
            # boolean literals in expression position (grammar [134])
            if nm in ("TRUE", "FALSE") and self.toks[self.i + 1][:2] != ("op", "("):
                self.next()
                return Lit(nm == "TRUE")
            # EXISTS { pattern } as an EXPRESSION (ast.rs:574
            # Expression::Exists — legal anywhere an expression is, not
            # just FILTER); compile_select/_compile_group hoist it onto a
            # left-join flag column
            if nm == "EXISTS" and self.toks[self.i + 1][:2] == ("op", "{"):
                self.next()
                return FExpr("exists_group", (self.group(),))
            if (
                nm == "NOT"
                and self.toks[self.i + 1][0] == "name"
                and self.toks[self.i + 1][1].upper() == "EXISTS"
                and self.toks[self.i + 2][:2] == ("op", "{")
            ):
                self.next()
                self.next()
                return FExpr("not", (FExpr("exists_group", (self.group(),)),))
        if self.at("name"):
            fname = self.next()[1].upper()
            self.eat("op", "(")
            args = []
            agg_distinct = False
            agg_sep = None
            if fname.lower() in _AGG_NAMES and self.at("name") and self.peek()[1].upper() == "DISTINCT":
                # aggregate call in expression position (HAVING/ORDER BY):
                # the call is resolved against the SELECT aggregate by
                # (fn, arg) — record the modifier so the resolver can
                # reject a call whose DISTINCT differs from the SELECT's
                self.next()
                agg_distinct = True
            while not self.at("op", ")"):
                if fname.lower() in _AGG_NAMES and self.at("op", "*") and not args:
                    # COUNT(*) in expression position (HAVING/ORDER BY):
                    # star means "no argument" to the (fn, arg) resolver,
                    # same as the SELECT-side parse (r13 probe fix)
                    self.next()
                    continue
                if self.at("op", ";"):
                    # GROUP_CONCAT(?x ; separator="…") — record the
                    # separator so the resolver can reject a repeated call
                    # whose separator differs from the SELECT aggregate's
                    self.next()
                    if not (self.at("name") and self.peek()[1].upper() == "SEPARATOR"):
                        raise SparqlSyntaxError(
                            f"expected SEPARATOR after ';', got {self.peek()!r}"
                        )
                    self.next()
                    self.eat("op", "=")
                    agg_sep = _unescape(self.eat("str")[1][1:-1])
                    continue
                # full expressions as arguments (IF conditions etc.)
                args.append(self.filter_expr())
                if self.at("op", ","):
                    self.next()
            self.eat("op", ")")
            if fname == "REGEX":
                return FExpr("regex", tuple(args))
            if fname == "BOUND":
                return FExpr("bound", tuple(args))
            if fname.lower() in _AGG_NAMES:
                # trailing marker arg carrying the call's modifiers; the
                # HAVING/ORDER BY resolver strips it before (fn, arg)
                # matching and validates it against the SELECT aggregate
                meta = FExpr("__aggmeta__", (agg_distinct, agg_sep))
                return FExpr("call:" + fname.lower(), tuple(args) + (meta,))
            return FExpr("call:" + fname.lower(), tuple(args))
        return self.term()


def parse(src: str) -> SelectQuery:
    return Parser(src).parse()
